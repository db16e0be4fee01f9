"""Melodic family: detuned slow pad with amplitude pulse.

Plain contract.
"""
import numpy as np


def generate(sr, duration):
    n = max(1, int(sr * duration))
    t = np.arange(n) / sr
    y = np.zeros(n)
    for det in (-0.4, 0.0, 0.4):
        y += np.sin(2 * np.pi * (196.0 + det) * t) / 3.0
    pulse = 0.6 + 0.4 * np.sin(2 * np.pi * 0.8 * t)
    fade = np.minimum(1.0, t / 0.1) * np.minimum(
        1.0, (duration - t) / max(0.1, duration * 0.2))
    return (0.5 * y * pulse * np.clip(fade, 0, 1)).astype(np.float32)
