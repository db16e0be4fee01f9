"""Melodic family: microtonal overtone steps from grid position.

Context-aware: pitch = root * (cell_index+1)-th step of a 13-TET-ish
microtonal ladder, so the melody is literally the grid position.
"""
import numpy as np


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    total = max(1, int(context.get("cells_total", 8)))
    root = 110.0
    hz = root * (2.0 ** (ci / 13.0)) * (1 + (ci % 3) * 0.002)
    t = np.arange(n) / sr
    y = (np.sin(2 * np.pi * hz * t)
         + 0.35 * np.sin(2 * np.pi * 2.01 * hz * t)
         + 0.15 * np.sin(2 * np.pi * 3.0 * hz * t))
    a = max(1, int(0.008 * sr))
    r = max(1, int(0.25 * n))
    env = np.ones(n)
    env[:a] = np.linspace(0, 1, a)
    env[-r:] = np.linspace(1, 0, r) ** 2
    g = 0.5 * (0.6 + 0.4 * (1 - ci / total))
    return (g * y * env).astype(np.float32)
