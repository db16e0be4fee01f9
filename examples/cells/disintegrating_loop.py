"""Tape-degradation family: a micro-loop that disintegrates per pass.

Genre match for the reference's disintegration-loop idiom
(disintegration_loop_basic.py, degraded_loop_residue.py) — original
program: a two-partial motif loops for the whole cell; each pass loses a
random spectral bite (bandstop via subtracted bandpassed copy), gains
asperity noise, and drops amplitude — the cell index sets how decayed the
loop already is when it enters.
"""
import numpy as np


def _bandpassed(x, sr, hz, q):
    # 2nd-order resonator impulse method: y = x * (normalized biquad BP)
    w = 2.0 * np.pi * hz / sr
    r = float(np.exp(-w / (2.0 * q)))
    b1, b2 = 2.0 * r * np.cos(w), -r * r
    y = np.empty_like(x)
    y1 = y2 = 0.0
    for i in range(len(x)):
        v = x[i] + b1 * y1 + b2 * y2
        y[i] = v - y2                   # BP-ish difference output
        y2, y1 = y1, v
    m = float(np.max(np.abs(y))) or 1.0
    return y / m


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    rng = np.random.default_rng(52000 + 3 * ci)

    loop_n = max(64, int(0.22 * sr))
    t = np.arange(loop_n) / sr
    motif = (0.6 * np.sin(2 * np.pi * 233.08 * t)
             + 0.3 * np.sin(2 * np.pi * 349.23 * t + 0.7)) \
        * np.hanning(loop_n)
    motif = motif.astype(np.float32)

    passes = -(-n // loop_n)
    wear0 = ci                           # older cells enter more decayed
    out = np.zeros(passes * loop_n, np.float32)
    for p in range(passes):
        wear = wear0 + p
        m = motif.copy()
        for _ in range(min(wear, 6)):    # spectral bites
            hz = float(rng.uniform(180.0, 2800.0))
            m = m - 0.8 * _bandpassed(m, sr, hz, 6.0).astype(np.float32) \
                * np.float32(np.max(np.abs(m)))
        hiss = rng.standard_normal(loop_n).astype(np.float32)
        m = (0.82 ** wear) * m + 0.004 * wear * hiss
        out[p * loop_n:(p + 1) * loop_n] = m
    return out[:n].astype(np.float32)
