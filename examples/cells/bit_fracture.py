"""Glitch family: bit-depth fracture with dropout gaps.

Plain-contract cell (grid_audio_app.py:79-90 arity rules):
``generate(sr, duration) -> np.ndarray``.
"""
import numpy as np


def generate(sr, duration):
    n = max(1, int(sr * duration))
    rng = np.random.default_rng(1091)
    t = np.arange(n) / sr
    base = 0.6 * np.sin(2 * np.pi * 141.0 * t) \
        + 0.3 * np.sin(2 * np.pi * 283.0 * t + 0.7)
    # coarse requantize in shifting depth bands
    seg = max(1, n // 9)
    out = np.empty(n, np.float32)
    for k in range(0, n, seg):
        bits = int(rng.integers(3, 8))
        q = float(2 ** (bits - 1) - 1)
        sl = slice(k, min(n, k + seg))
        out[sl] = np.round(base[sl] * q) / q
    # dropout gaps
    gaps = rng.integers(0, max(1, n - 64), size=6)
    for g in gaps:
        out[g:g + int(rng.integers(16, 64))] = 0.0
    return out.astype(np.float32)
