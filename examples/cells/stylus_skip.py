"""Glitch family: skipping-stylus micro-loop.

A short fragment locks and repeats with tiny period jitter, like a stuck
record surface.  Plain contract.
"""
import numpy as np


def generate(sr, duration):
    n = max(1, int(sr * duration))
    rng = np.random.default_rng(4481)
    t = np.arange(n) / sr
    src = (0.5 * np.sin(2 * np.pi * 220.0 * t)
           + 0.2 * np.sin(2 * np.pi * 661.5 * t)).astype(np.float32)
    loop = max(64, int(0.018 * sr))
    out = np.zeros(n, np.float32)
    i = 0
    while i < n:
        j = int(rng.integers(0, loop // 4))
        piece = src[j:j + loop]
        m = min(len(piece), n - i)
        out[i:i + m] = piece[:m]
        # click at the skip point
        out[i] = 0.8 if (i // loop) % 2 else -0.8
        i += m
    return out
