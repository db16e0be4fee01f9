"""Collage family: splice-lattice cutting of a synthetic source.

Genre match for the reference's splice-cutter idiom
(splice_grid_cutter.py, buffer_shattering.py) — original program: a
swept-tone "source reel" is cut on a golden-ratio lattice and the pieces
are re-laid in bit-reversed order with hard splices; every other cell
reverses the odd-numbered pieces.
"""
import numpy as np


def _bit_reverse(k, bits):
    v = 0
    for _ in range(bits):
        v = (v << 1) | (k & 1)
        k >>= 1
    return v


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    t = np.arange(n) / sr
    f0, f1 = 160.0 * (1 + ci % 3), 1400.0
    sweep = np.sin(2 * np.pi * (f0 * t + (f1 - f0) * t * t
                                / (2 * max(1e-6, duration))))
    src = (sweep * np.hanning(n)).astype(np.float32)

    bits = 4                            # 16 lattice pieces
    pieces = 1 << bits
    # golden-ratio lattice: cut points from the low-discrepancy sequence
    phi = 0.6180339887498949
    cuts = sorted({int(((k * phi) % 1.0) * n) for k in range(1, pieces)})
    cuts = [0] + cuts + [n]
    segs = [src[a:b] for a, b in zip(cuts[:-1], cuts[1:]) if b > a]
    order = sorted(range(len(segs)),
                   key=lambda k: _bit_reverse(k, bits))
    out = []
    for rank, k in enumerate(order):
        s = segs[k]
        if ci % 2 == 1 and rank % 2 == 1:
            s = s[::-1]
        out.append(s)
    y = np.concatenate(out)[:n]
    if len(y) < n:
        y = np.pad(y, (0, n - len(y)))
    return (0.8 * y).astype(np.float32)
