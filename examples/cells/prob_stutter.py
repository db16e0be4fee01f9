"""Rhythmic family: probabilistic stutter gate over filtered noise.

Context-aware: the gate probability rises with cell_index (sparse start,
dense end of the pattern).
"""
import numpy as np


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    total = max(1, int(context.get("cells_total", 8)))
    rng = np.random.default_rng(9300 + ci)
    x = rng.standard_normal(n).astype(np.float32)
    # crude low-pass: cumulative mean over a small box
    k = 24
    c = np.cumsum(np.concatenate([[0.0], x]))
    x = ((c[k:] - c[:-k]) / k).astype(np.float32)
    x = np.concatenate([x, np.zeros(n - len(x), np.float32)])
    gate_n = max(32, int(0.02 * sr))
    p = 0.2 + 0.6 * ci / total
    gates = rng.random(n // gate_n + 1) < p
    g = np.repeat(gates, gate_n)[:n].astype(np.float32)
    return np.clip(3.0 * x * g, -1.0, 1.0)
