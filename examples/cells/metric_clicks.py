"""Rhythmic family: metric-modulation clicks — the click subdivision
switches 3 -> 4 -> 6 per cell position while the total cell duration is
preserved (metric_modulation_clicks spirit).  Context-aware.
"""
import numpy as np


def generate(sr, dur, context=None):
    n = int(round(sr * dur))
    ci = int((context or {}).get("cell_index", 0))
    sub = (3, 4, 6)[ci % 3]
    y = np.zeros(n, np.float32)
    k = max(8, int(0.0015 * sr))
    click = (np.hanning(2 * k)[:k] * np.sign(np.sin(
        np.arange(k) * 0.9))).astype(np.float32)
    for j in range(sub):
        st = int(j * n / sub)
        en = min(n, st + k)
        y[st:en] += click[: en - st] * (1.0 if j == 0 else 0.55)
    return (0.8 * y).astype(np.float32)
