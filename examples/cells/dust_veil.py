"""Glitch/texture family: spectrally masked noise with drifting bins.

Context-aware: the mask drifts with the cell's position in the pattern
(cell_start / track_pattern_duration), so the veil slowly opens over a bar.
"""
import numpy as np


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    pos = float(context.get("cell_start", 0.0)) \
        / max(float(context.get("track_pattern_duration", 1.0)), 1e-9)
    rng = np.random.default_rng(int(3000 + 97 * pos))
    x = rng.standard_normal(n).astype(np.float32)
    X = np.fft.rfft(x)
    k = np.arange(len(X))
    # a handful of narrow pass-bands that drift upward with position
    mask = np.zeros(len(X))
    for c in (0.05, 0.13, 0.27, 0.41):
        centre = (c + 0.3 * pos) * len(X)
        mask += np.exp(-0.5 * ((k - centre) / (0.01 * len(X))) ** 2)
    y = np.fft.irfft(X * mask, n).astype(np.float32)
    peak = float(np.max(np.abs(y))) or 1.0
    env = np.minimum(1.0, np.arange(n) / (0.01 * sr + 1))
    return (0.7 * y / peak * env).astype(np.float32)
