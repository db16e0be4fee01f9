"""Glitch family: a tiny melodic loop read back with slow wow — the
micro-loop pitch sags and recovers once per cell (tape_wow_microloop
spirit).
"""
import numpy as np


def generate(sr, dur):
    n = int(round(sr * dur))
    rng = np.random.default_rng(77)
    # source: 90 ms pluck loop
    m = max(64, int(0.09 * sr))
    t = np.arange(m) / sr
    f0 = 220.0 * 2.0 ** (rng.integers(0, 5) / 12.0)
    src = np.sin(2 * np.pi * f0 * t) * np.exp(-t * 18.0)
    # wow: +-0.8% speed at 0.7 Hz
    i = np.arange(n)
    speed = 1.0 + 0.008 * np.sin(2 * np.pi * 0.7 * i / sr)
    pos = np.cumsum(speed)
    i0 = np.floor(pos).astype(np.int64) % m
    fr = (pos - np.floor(pos)).astype(np.float64)
    y = (1.0 - fr) * src[i0] + fr * src[(i0 + 1) % m]
    return (0.75 * y).astype(np.float32)
