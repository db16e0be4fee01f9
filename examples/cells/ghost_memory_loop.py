"""Glitch/texture family: decaying memory of earlier repeats.

Context-aware: each repetition of the cell (tracked via master_time-free
deterministic seeding by cell_index) layers a quieter, darker copy, like a
loop degrading in memory.
"""
import numpy as np


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    t = np.arange(n) / sr
    out = np.zeros(n, np.float32)
    hz = 164.81
    for layer in range(1 + ci % 4):
        g = 0.55 * (0.6 ** layer)
        cutoff_mod = 1.0 / (1 + layer)
        y = np.sin(2 * np.pi * hz * (1 + 0.002 * layer) * t)
        # darker each layer: simple one-pole smoothing repeated
        for _ in range(layer):
            y = np.concatenate([[y[0]], 0.65 * y[1:] + 0.35 * y[:-1]])
        out += (g * cutoff_mod * y * np.exp(-2.0 * t / max(duration, 1e-6))
                ).astype(np.float32)
    return np.clip(out, -1.0, 1.0)
