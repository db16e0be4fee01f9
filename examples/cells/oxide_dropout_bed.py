"""Texture family: oxide-shedding loop bed — a soft filtered-noise drone
whose amplitude carries magnetic-dropout bites (short exponential gain
dips at Poisson times) plus a constant hiss floor, like a tape whose
coating is flaking off.  Deterministic per cell index."""
import numpy as np


def generate(sr, dur, context=None):
    n = int(round(sr * dur))
    ci = int((context or {}).get("cell_index", 0))
    rng = np.random.default_rng(61300 + ci)

    # drone: two-pole-ish smoothed noise (cumulative leaky integrator x2)
    x = rng.standard_normal(n).astype(np.float64)
    for _ in range(2):
        y = np.empty_like(x)
        acc = 0.0
        a = np.exp(-2 * np.pi * 140.0 / sr)
        for i in range(n):          # small n per cell; clarity over speed
            acc = a * acc + (1 - a) * x[i]
            y[i] = acc
        x = y
    drone = x / (np.max(np.abs(x)) + 1e-12)

    gain = np.ones(n)
    t = 0
    while t < n:
        t += int(rng.exponential(0.25) * sr) + 1
        if t >= n:
            break
        depth = rng.uniform(0.5, 0.95)
        w = int(rng.uniform(0.004, 0.03) * sr) + 4
        seg = min(w, n - t)
        gain[t:t + seg] *= 1.0 - depth * np.exp(-np.arange(seg) / (0.3 * w))
    hiss = 0.02 * rng.standard_normal(n)
    out = 0.5 * drone * gain + hiss
    fade = min(n // 8 + 1, int(0.02 * sr) + 1)
    out[:fade] *= np.linspace(0, 1, fade)
    out[-fade:] *= np.linspace(1, 0, fade)
    return out.astype(np.float32)
