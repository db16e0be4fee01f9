"""Melodic family: stacked-fifths chord voice.

Plain contract; three voices at pythagorean fifth ratios with slow beating.
"""
import numpy as np


def generate(sr, duration):
    n = max(1, int(sr * duration))
    t = np.arange(n) / sr
    root = 146.83
    y = np.zeros(n)
    for k, (ratio, g) in enumerate([(1.0, 0.5), (1.5, 0.35), (2.25, 0.22)]):
        y += g * np.sin(2 * np.pi * root * ratio * t + 0.1 * k)
    env = np.minimum(1.0, t / 0.05) * np.exp(-1.2 * t / max(duration, 1e-6))
    return (y * env).astype(np.float32)
