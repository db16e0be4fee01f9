"""Melodic-advanced family: slow detuned swells walking a Lydian scale;
the chord voicing widens with cell index and each voice carries its own
vibrato rate, giving a choir-like beating.  Context-aware pitch: the
scale degree comes from the cell's grid position."""
import numpy as np

_LYDIAN = [0, 2, 4, 6, 7, 9, 11]


def generate(sr, dur, context=None):
    n = int(round(sr * dur))
    ci = int((context or {}).get("cell_index", 0))
    rng = np.random.default_rng(84700 + ci)

    degree = _LYDIAN[ci % len(_LYDIAN)] + 12 * (ci % 3 == 2)
    f0 = 110.0 * 2.0 ** (degree / 12.0)
    voices = 3 + (ci % 3)
    t = np.arange(n) / sr
    out = np.zeros(n, np.float64)
    for v in range(voices):
        det = 1.0 + (v - (voices - 1) / 2) * 0.004 * (1 + ci % 4)
        vib = 1.0 + 0.003 * np.sin(2 * np.pi * rng.uniform(3.5, 6.5) * t
                                   + rng.uniform(0, 2 * np.pi))
        ph = 2 * np.pi * f0 * det * np.cumsum(vib) / sr
        tone = np.sin(ph) + 0.35 * np.sin(2 * ph) + 0.12 * np.sin(3 * ph)
        out += tone / voices
    # swell: raised-cosine attack to 60%, release over the rest
    k = max(1, int(0.6 * n))
    env = np.ones(n)
    env[:k] = 0.5 - 0.5 * np.cos(np.pi * np.arange(k) / k)
    env[k:] = np.linspace(1.0, 0.0, n - k) ** 1.5
    return (0.5 * env * out / (np.max(np.abs(out)) + 1e-12)) \
        .astype(np.float32)
