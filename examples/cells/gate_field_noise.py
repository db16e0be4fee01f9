"""Rhythmic family: probabilistic gate field over filtered noise.

Genre match for the reference's gate-field idiom
(example_generators_rhythmic/rhythmic_gate_field.py) — original program:
a 32-slot gate sequence drawn from a per-cell seeded RNG whose open
probability ramps along the track, gating a one-pole-lowpassed noise bed;
gates snap open instantly and release exponentially.
"""
import numpy as np


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    total = max(1, int(context.get("cells_total", 8)))
    rng = np.random.default_rng(9000 + 7 * ci)

    noise = rng.standard_normal(n).astype(np.float32)
    # one-pole lowpass, cutoff rises with cell index
    a = float(np.exp(-2.0 * np.pi * (400.0 + 250.0 * ci) / sr))
    y = np.empty(n, np.float32)
    acc = 0.0
    for i in range(n):                  # short cells: host loop is fine
        acc = (1.0 - a) * noise[i] + a * acc
        y[i] = acc

    slots = 32
    p_open = 0.15 + 0.7 * (ci / total)
    gates = rng.random(slots) < p_open
    slot_n = max(1, n // slots)
    env = np.zeros(n, np.float32)
    rel = max(1, int(0.020 * sr))
    for s in range(slots):
        if gates[s]:
            a0 = s * slot_n
            b0 = min(n, a0 + slot_n)
            env[a0:b0] = 1.0
            e = min(n, b0 + rel)
            env[b0:e] = np.maximum(
                env[b0:e], np.exp(-np.arange(e - b0) / (rel / 4.0)))
    return (2.2 * y * env).astype(np.float32)
