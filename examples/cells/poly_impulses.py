"""Rhythmic family: polyrhythmic impulse trains (3:4:5 over the cell).

Plain contract.
"""
import numpy as np


def generate(sr, duration):
    n = max(1, int(sr * duration))
    out = np.zeros(n, np.float32)
    for div, gain, hz in ((3, 0.9, 900.0), (4, 0.6, 1400.0), (5, 0.45, 2100.0)):
        period = n // div if div else n
        blip_n = max(8, int(0.002 * sr))
        t = np.arange(blip_n) / sr
        blip = (np.sin(2 * np.pi * hz * t) * np.exp(-t / 0.001)) * gain
        for k in range(div):
            s = k * period
            e = min(n, s + blip_n)
            out[s:e] += blip[: e - s].astype(np.float32)
    return np.clip(out, -1.0, 1.0)
