"""Glitch family: scattered buffer shards, some reversed.

Context-aware cell (``generate(sr, duration, context)``): the shard layout
is seeded from cell_index so every grid cell fractures differently
(context keys per examples/README.md and grid_audio_app README_CONTEXT).
"""
import numpy as np


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    rng = np.random.default_rng(2200 + ci)
    t = np.arange(n) / sr
    src = np.sin(2 * np.pi * (180.0 + 40.0 * ci) * t) \
        * np.exp(-3.0 * t / max(duration, 1e-6))
    out = np.zeros(n, np.float32)
    shard = max(32, n // 16)
    for _ in range(12):
        a = int(rng.integers(0, max(1, n - shard)))
        b = int(rng.integers(0, max(1, n - shard)))
        piece = src[a:a + shard].copy()
        if rng.random() < 0.4:
            piece = piece[::-1]
        out[b:b + len(piece)] += piece * float(rng.uniform(0.3, 0.9))
    return np.clip(out, -1.0, 1.0).astype(np.float32)
