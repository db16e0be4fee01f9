"""Advanced-melodic: grid-position partial sieve.

The cell's grid position (cell_index / cells_total) selects WHICH harmonics
of a fixed fundamental survive, via a modular sieve — so one generator file
yields a different spectrum in every column (the grid-aware idea of the
reference's melody_from_grid_position — grid_audio_app_0.2/examples/
example_generators_melodic_advanced/melody_from_grid_position.py — taken to
the spectral domain instead of the scale degree).
"""
import numpy as np


def generate(sr, duration, context=None):
    n = int(sr * duration)
    if n <= 0:
        return np.zeros(0, np.float32)
    ci = int(context.get("cell_index", 0)) if context else 0
    ct = max(2, int(context.get("cells_total", 8)) if context else 8)
    t = np.arange(n, dtype=np.float32) / sr
    f0 = 98.0  # G2
    y = np.zeros(n, np.float32)
    kept = 0
    for k in range(1, 17):
        if (k * (ci + 2)) % ct < max(1, ct // 2):
            continue  # sieved out
        kept += 1
        decay = 1.2 + 0.35 * k
        y += (0.6 / k) * np.sin(2 * np.pi * f0 * k * t) * np.exp(-t * decay)
    if kept == 0:  # degenerate sieve: fall back to the fundamental
        y = 0.5 * np.sin(2 * np.pi * f0 * t) * np.exp(-t * 1.5)
    return np.tanh(y).astype(np.float32)
