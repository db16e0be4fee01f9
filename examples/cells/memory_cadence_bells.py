"""Melodic family: cadence drawn from an accumulating pitch memory.

Genre match for the reference's memory-cadence idiom
(example_generators_more_melodic/memory_cadence.py) — original program:
each cell APPENDS its own degree to a deterministic "memory" (recomputed
from the cell index, so rendering stays pure), then arpeggiates the
remembered set as bell partials; every fourth cell resolves the memory
down a fifth.
"""
import numpy as np

_LADDER = [0, 2, 5, 7, 9, 12, 14]


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    memory = [_LADDER[k % len(_LADDER)] for k in range(ci + 1)][-5:]
    cadence = (ci + 1) % 4 == 0
    root = 261.63 * (2.0 ** (-7 / 12.0) if cadence else 1.0)

    out = np.zeros(n, np.float32)
    hit_n = max(1, n // max(1, len(memory)))
    for k, deg in enumerate(memory):
        hz = root * (2.0 ** (deg / 12.0))
        a = k * hit_n
        m = n - a
        if m <= 0:
            break
        t = np.arange(m) / sr
        bell = (np.sin(2 * np.pi * hz * t)
                + 0.5 * np.sin(2 * np.pi * 2.76 * hz * t)
                + 0.2 * np.sin(2 * np.pi * 5.40 * hz * t))
        bell *= np.exp(-t / (0.25 if cadence else 0.12))
        out[a:] += (0.3 * bell).astype(np.float32)
    return out.astype(np.float32)
