"""Glitch family: sparse drifting spectral bins — narrowband noise dust
whose active bins random-walk from cell to cell (in the spirit of the
reference's spectral_dust family).  Context-aware: the drift is seeded by
the cell index so every grid position has its own spectrum.
"""
import numpy as np


def generate(sr, dur, context=None):
    n = int(round(sr * dur))
    ci = int((context or {}).get("cell_index", 0))
    rng = np.random.default_rng(1200 + ci)
    nf = n // 2 + 1
    mag = np.zeros(nf)
    # 6 active bins random-walking upward with the cell index
    base = 8 + 3 * ci
    for k in range(6):
        b = int(base * (k + 1) + rng.integers(-2, 3))
        if 1 <= b < nf:
            mag[b] = rng.uniform(0.4, 1.0)
    phase = rng.uniform(0, 2 * np.pi, nf)
    spec = mag * np.exp(1j * phase)
    y = np.fft.irfft(spec, n=n)
    peak = np.max(np.abs(y)) or 1.0
    env = np.minimum(1.0, np.arange(n) / max(1, int(0.004 * sr)))
    env *= env[::-1]
    return (0.7 * y / peak * env).astype(np.float32)
