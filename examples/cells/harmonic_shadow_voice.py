"""Melodic family: a lead degree with a lagging harmonic shadow.

Genre match for the reference's harmonic-shadow idiom
(example_generators_more_melodic/harmonic_shadow.py) — original program:
the lead tone picks a pentatonic degree from the cell index; a quieter
"shadow" voice sounds the PREVIOUS cell's degree transposed to the
nearest common overtone, entering late and outliving the lead.
"""
import numpy as np

_PENTA = [0, 3, 5, 7, 10]


def _deg_hz(ci):
    return 220.0 * (2.0 ** (_PENTA[ci % 5] / 12.0 + (ci // 5) % 2))


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    t = np.arange(n) / sr

    lead_hz = _deg_hz(ci)
    shadow_hz = _deg_hz(max(0, ci - 1))
    # snap the shadow to the nearest shared overtone of the lead
    ratio = shadow_hz / lead_hz
    shadow_hz = lead_hz * max(1, round(ratio * 2)) / 2.0

    lead = np.sin(2 * np.pi * lead_hz * t) \
        + 0.25 * np.sin(2 * np.pi * 3.0 * lead_hz * t)
    le = np.exp(-t / (0.30 * max(0.05, duration)))

    on = int(0.35 * n)                   # shadow enters late...
    sh = np.zeros(n)
    ts = np.arange(n - on) / sr
    sh[on:] = np.sin(2 * np.pi * shadow_hz * ts) \
        * (1.0 - np.exp(-ts / 0.05))     # ...and swells instead of decaying
    return (0.5 * lead * le + 0.22 * sh).astype(np.float32)
