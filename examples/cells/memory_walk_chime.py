"""Advanced-melodic: recency-weighted pitch walk on a just-intonation hexany.

A chime voice walks a 6-tone just lattice; past pitches are revisited with
probability proportional to an exponentially-decaying recency weight (the
"memory" idea of the reference's harmonic_memory_walk —
grid_audio_app_0.2/examples/example_generators_melodic_advanced/
harmonic_memory_walk.py — realized here with a weighted distribution instead
of uniform history choice, on a different scale and synthesis).
"""
import numpy as np

_HEXANY = np.array([1.0, 5 / 4, 3 / 2, 7 / 4, 15 / 8, 35 / 16])


def generate(sr, duration, context=None):
    n = int(sr * duration)
    if n <= 0:
        return np.zeros(0, np.float32)
    ci = int(context.get("cell_index", 0)) if context else 0
    rng = np.random.default_rng(70909 + 61 * ci)
    base = 164.8  # E3
    step = max(1, int(0.22 * sr))
    y = np.zeros(n, np.float32)
    weights = np.zeros(len(_HEXANY))
    for i in range(0, n, step):
        if weights.sum() > 0 and rng.random() < 0.65:
            p = weights / weights.sum()
            k = int(rng.choice(len(_HEXANY), p=p))
        else:
            k = int(rng.integers(0, len(_HEXANY)))
        weights *= 0.6          # decay all memories
        weights[k] += 1.0       # reinforce the chosen tone
        f = base * _HEXANY[k] * (2.0 if rng.random() < 0.2 else 1.0)
        L = min(step * 2, n - i)
        t = np.arange(L, dtype=np.float32) / sr
        env = np.exp(-t * 4.5)
        y[i:i + L] += 0.3 * env * (np.sin(2 * np.pi * f * t)
                                   + 0.4 * np.sin(2 * np.pi * f * 2.01 * t))
    return np.tanh(y).astype(np.float32)
