"""Rhythmic family: two interlocking Euclidean layers whose rotations
walk in opposite directions as the grid advances — the composite pattern
never repeats across cells even though both layers do.  Uses only the
2-arg generate signature via a module-level call counter when no context
is provided."""
import numpy as np

_CALLS = {"n": 0}


def _euclid(k, n):
    # Bjorklund by rounding: pulse at floor boundaries of k/n
    return [int((i * k) % n < k) for i in range(n)]


def generate(sr, dur, context=None):
    if context is not None:
        ci = int(context.get("cell_index", 0))
    else:
        ci = _CALLS["n"]
        _CALLS["n"] += 1
    n = int(round(sr * dur))
    rng = np.random.default_rng(73100 + ci)

    steps = 16
    a = np.roll(_euclid(5, steps), ci % steps)
    b = np.roll(_euclid(7, steps), -(ci % steps))
    out = np.zeros(n, np.float64)
    step_n = max(1, n // steps)
    for i in range(steps):
        t0 = i * step_n
        if a[i]:
            L = min(int(0.004 * sr) + 8, n - t0)
            out[t0:t0 + L] += 0.8 * np.exp(-np.arange(L) / (0.001 * sr + 1))
        if b[i]:
            L = min(int(0.012 * sr) + 8, n - t0)
            ping = np.sin(2 * np.pi * 1400.0 * np.arange(L) / sr)
            out[t0:t0 + L] += 0.35 * ping * np.exp(
                -np.arange(L) / (0.003 * sr + 1))
    click_jit = 0.02 * rng.standard_normal(n) * (np.abs(out) > 1e-3)
    return np.clip(out + click_jit, -1, 1).astype(np.float32)
