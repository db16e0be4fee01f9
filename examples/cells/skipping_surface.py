"""Glitch family: skipping playback surface.

Genre match for the reference's skipping-CD idiom
(skipping_cd_surface.py, micro_edit_skip.py) — original program: a
sustained chord "disc" plays through a read head that, at deterministic
per-cell skip points, jumps back by a small random offset and holds a
4 ms freeze-buzz before resuming — the skip density rises along the
track.
"""
import numpy as np


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    total = max(1, int(context.get("cells_total", 8)))
    rng = np.random.default_rng(77000 + 5 * ci)

    t = np.arange(n) / sr
    disc = (0.5 * np.sin(2 * np.pi * 196.0 * t)
            + 0.35 * np.sin(2 * np.pi * 246.94 * t)
            + 0.25 * np.sin(2 * np.pi * 293.66 * t)).astype(np.float32)

    skips = 2 + int(8 * ci / total)
    pos = np.sort(rng.integers(int(0.1 * n), int(0.95 * n), size=skips))
    freeze_n = max(8, int(0.004 * sr))
    out = disc.copy()
    read = np.arange(n)
    for p in pos:
        back = int(rng.integers(freeze_n, 6 * freeze_n))
        # freeze-buzz: tile the 4 ms before the skip point
        seg = disc[max(0, p - freeze_n):p]
        if len(seg) == 0:
            continue
        reps = -(-(3 * freeze_n) // len(seg))
        buzz = np.tile(seg, reps)[: 3 * freeze_n]
        e = min(n, p + len(buzz))
        out[p:e] = buzz[: e - p]
        # after the buzz, resume from `back` samples earlier
        rem = n - e
        if rem > 0:
            src = max(0, p - back)
            out[e:] = disc[src:src + rem] if src + rem <= n \
                else np.pad(disc[src:], (0, rem - (n - src)))[:rem]
    del read
    return (0.8 * out).astype(np.float32)
