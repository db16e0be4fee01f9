"""Rhythmic family: metric pressure waves — click trains that
accelerate into the cell midpoint and relax back out (a continuous
accelerando/ritardando), with click brightness tracking instantaneous
rate.  The 2-arg signature keeps it drop-in for any grid."""
import numpy as np


def generate(sr, dur):
    n = int(round(sr * dur))
    out = np.zeros(n, np.float64)
    # instantaneous rate: 4 Hz at the edges -> 28 Hz at the middle
    tt = np.arange(n) / max(1, n)
    rate = 4.0 + 24.0 * np.sin(np.pi * tt) ** 2
    phase = np.cumsum(rate) / sr
    ticks = np.flatnonzero(np.diff(np.floor(phase)) > 0)
    for t0 in ticks:
        r = rate[t0]
        L = min(int(0.002 * sr) + 6, n - t0)
        f = 600.0 + 90.0 * r
        k = np.arange(L)
        out[t0:t0 + L] += np.cos(2 * np.pi * f * k / sr) \
            * np.exp(-k / (0.0004 * sr + 1)) * (0.4 + 0.02 * r)
    return np.clip(out, -1, 1).astype(np.float32)
