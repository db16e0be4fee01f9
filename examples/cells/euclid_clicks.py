"""Rhythmic family: Euclidean click pattern.

Context-aware: pulse count = Bjorklund E(cells_total, cell_index+1), so each
cell along the track densifies the rhythm.
"""
import numpy as np


def _euclid(steps, pulses):
    # Bjorklund via the rotation-free "bresenham" formulation
    return [((i * pulses) % steps) < pulses for i in range(steps)]


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    steps = 16
    pulses = 1 + (ci % 7)
    pat = _euclid(steps, pulses)
    out = np.zeros(n, np.float32)
    step_n = max(1, n // steps)
    click_n = max(8, int(0.003 * sr))
    t = np.arange(click_n) / sr
    click = (np.sin(2 * np.pi * 1800.0 * t)
             * np.exp(-t / 0.0008)).astype(np.float32)
    for i, on in enumerate(pat):
        if on:
            s = i * step_n
            e = min(n, s + click_n)
            out[s:e] += click[: e - s] * 0.8
    return out
