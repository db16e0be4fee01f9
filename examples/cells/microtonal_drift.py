"""Melodic family: microtonal steps — a held tone whose pitch climbs in
31-EDO steps with the cell index, with a soft attack (microtonal_steps
spirit).
"""
import numpy as np


def generate(sr, dur, context=None):
    n = int(round(sr * dur))
    ci = int((context or {}).get("cell_index", 0))
    total = int((context or {}).get("cells_total", 1))
    step = ci % max(1, total)
    f = 180.0 * 2.0 ** (step * 4 / 31.0)     # 4/31-octave strides
    t = np.arange(n) / sr
    y = (np.sin(2 * np.pi * f * t)
         + 0.35 * np.sin(2 * np.pi * 2 * f * t)
         + 0.15 * np.sin(2 * np.pi * 3 * f * t))
    a = max(1, int(0.02 * sr))
    env = np.ones(n)
    env[:a] = np.linspace(0, 1, a)
    env[-a:] *= np.linspace(1, 0, a)
    return (0.5 * y * env / 1.5).astype(np.float32)
