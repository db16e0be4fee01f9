"""NumPy oracle for the Scrubber render.

Block-loop port of scrubber/scrubber_0.7.py:157-235 (`audio_callback`) with
positions in the same int32 fixed point as the engine; consumes the same
program dict (precomputed increments / dropout envelope / jump bases) so the
position integrals agree exactly.
"""
from __future__ import annotations

import numpy as np

from audio_suite_tpu.ops.fixq import (
    POS_FRAC_BITS, POS_ONE, gather_linear_wrap_np,
)


def render_scrub_np(prog: dict) -> np.ndarray:
    audio = np.asarray(prog["audio"], np.float32)
    inc = np.asarray(prog["inc_fix"], np.int64)
    reset = np.asarray(prog["reset"], np.bool_)
    seg_w = np.asarray(prog["seg_bases_whole"], np.int64)
    seg_f = np.asarray(prog["seg_bases_frac"], np.int64)
    env_blocks = np.asarray(prog["env_blocks"], np.float32)
    head_off_w = np.asarray(prog["head_off_whole"], np.int64)
    head_off_f = np.asarray(prog["head_off_frac"], np.int64)
    head_gain = np.float32(prog["head_gain"])
    bs = int(prog["block_size"])
    T = int(prog["num_frames"])
    nb = T // bs

    out = np.zeros(T, np.float32)
    # sequential position accumulation (mirrors tape_pos carry,
    # scrubber_0.7.py:196-202, 228-230)
    w = int(seg_w[0])
    f = int(seg_f[0])
    seg = 0

    whole = np.zeros(T, np.int64)
    frac = np.zeros(T, np.int64)
    for i in range(T):
        if reset[i]:
            seg += 1
            w = int(seg_w[seg])
            f = int(seg_f[seg])
        whole[i] = w
        frac[i] = f
        ff = f + int(inc[i])
        carry = ff >> POS_FRAC_BITS
        w += carry
        f = ff - (carry << POS_FRAC_BITS)

    # live voice-configuration segments (head keys 1/2/3, Z/X C/V B/N):
    # each block reads with its control segment's head layout + gain
    segs = prog.get("head_segments") or [{
        "b0": 0, "b1": nb, "off_whole": head_off_w, "off_frac": head_off_f,
        "gain": head_gain}]
    seg_of_block = np.zeros(nb, np.int64)
    for si, s in enumerate(segs):
        seg_of_block[int(s["b0"]):int(s["b1"])] = si

    for b in range(nb):
        s = segs[int(seg_of_block[b])]
        sl = slice(b * bs, (b + 1) * bs)
        buf = np.zeros(bs, np.float32)
        for ow, of in zip(np.asarray(s["off_whole"], np.int64),
                          np.asarray(s["off_frac"], np.int64)):
            f2 = frac[sl] + int(of)
            c2 = f2 >> POS_FRAC_BITS
            w2 = whole[sl] + int(ow) + c2
            f2 = f2 - (c2 << POS_FRAC_BITS)
            buf += gather_linear_wrap_np(audio, w2, f2)
        buf *= np.float32(s["gain"])
        out[sl] = buf * env_blocks[b]
    return out
