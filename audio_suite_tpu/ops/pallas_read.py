"""Streaming fractional-read kernel — Pallas TPU.

The varispeed read shared by TapeTUC (`Tape…py:830-836`) and Scrubber
(`scrubber_0.7.py:141-154`) is `out[j] = lerp(audio[idx0[j]], audio[idx0[j]+1],
fr[j])` with near-monotone idx0.  The XLA blockwise engines
(`varispeed._tape_read_blockwise`, `scrub._read_blockwise_heads`) fetch
row-aligned windows with `jnp.take` and select samples with two-level
one-hot einsums; measured on v5e (tools/trace_top.py, round 3b) the
chunk-loop one-hot materialization costs ~21 ms of a 180 s tape render
because every `[chunk, 128, 128]` one-hot round-trips through HBM, and
the row fetch re-reads each 128-lane row ~`window/speed` times.

This kernel keeps everything on-chip:

- the grid walks CHUNKS of `CB` 128-sample output blocks; per chunk one
  async DMA copies a contiguous `[SPAN, 128]` slab of the extended audio
  into a double-buffered VMEM scratch (each audio row is fetched ~once
  per chunk instead of ~12x),
- per block, the two candidate window rows (`hi`, `hi+1`) are selected
  from the slab with one-hot MXU matmuls that never leave VMEM, and the
  linear-interpolation weights fold into a single two-hot over the
  256-lane row pair (the `_tape_read_blockwise_sinc` trick with 2 taps),
- blocks whose positions jump out of their chunk's slab (section-loop
  wraps, visit starts) are detected host/JAX-side and patched OUTSIDE
  the kernel with the canonical gather — same detect-and-patch contract
  as the XLA engines.

Selection parity: one-hot matmuls use an exact 3-way bf16 mantissa
split (`_split3`) so the only nonzero product per output lane is the
window value itself — results are bit-equal to the gather.  The final
two-hot reduce computes `(1-f)*x0 + 0 + ... + f*x1` whose zero terms
add exactly.

MEASURED VERDICT (v5e, tools/read_experiments.py, 180 s @ 48 kHz,
span 4): the streaming kernel TIES the XLA blockwise engine — pallas
v2 30.1 ms vs XLA 31.5 ms (pair gather 124.6 ms), bit-exact.  The
variant ladder splits the cost: v0 (grid+DMA+loop floor) ~8 ms, v4
(VPU two-hot only) 22.8 ms, v5 (MXU row-select only) 36.1 ms — the
slab DMA is nearly free and BOTH selection stages are individually
comparable to the whole XLA engine, i.e. the cost is per-block vector
op issue, not HBM traffic as the round-4 roadmap hypothesized (the
XLA engine's 21 ms one-hot "HBM materialization" was already being
fused better than the trace suggested).  A single merged dot (v3:
one-hots stacked along M, mantissa parts along K) measured SLOWER
than v2.  Kept as a documented experiment + probe harness; the XLA
blockwise engines remain the production read path.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:       # pragma: no cover
    _HAVE_PALLAS = False

LANE = 128


def read_available() -> bool:
    if not _HAVE_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:       # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _split3(ws):
    """Exact 3-way bf16 mantissa split: ws == p0 + p1 + p2 with every part
    bf16-representable (truncation masking, not rounding — each residual
    keeps <= 8 significant bits, so the parts and their partial sums are
    exact in f32 and the one-hot bf16 dots reconstruct ws bit-exactly)."""
    u = pltpu.bitcast(ws, jnp.uint32)
    p0 = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
    r1 = ws - p0
    u1 = pltpu.bitcast(r1, jnp.uint32)
    p1 = pltpu.bitcast(u1 & jnp.uint32(0xFFFF0000), jnp.float32)
    r2 = r1 - p1
    return (p0.astype(jnp.bfloat16), p1.astype(jnp.bfloat16),
            r2.astype(jnp.bfloat16))


def _read_kernel_body(row_start_ref, blk_lo_ref, rel_ref, f_ref,
                      ext_ref, out_ref, slab, sem, *, CB, SPAN, WB,
                      variant):
    c = pl.program_id(0)
    C = pl.num_programs(0)

    def slab_dma(chunk, slot):
        return pltpu.make_async_copy(
            ext_ref.at[pl.ds(row_start_ref[chunk], SPAN)],
            slab.at[slot], sem.at[slot])

    @pl.when(c == 0)
    def _():
        slab_dma(0, 0).start()

    @pl.when(c + 1 < C)
    def _():
        slab_dma(c + 1, (c + 1) % 2).start()

    slab_dma(c, c % 2).wait()
    slot = c % 2

    h_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, WB), 1)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, 2 * LANE), 1)
    h3_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * LANE, 3 * WB),
                                       1) % WB
    l1_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)

    def body(b, _):
        rel = rel_ref[0, b]              # [128] i32, window-relative
        f = f_ref[0, b]                  # [128] f32
        if variant == 0:                 # floor: grid + DMA + loop only
            out_ref[0, b] = f + rel.astype(jnp.float32)
            return 0
        base = blk_lo_ref[c * CB + b]    # slab row of this block's window
        ws = slab[slot, pl.ds(base, WB), :]     # [WB, 128]
        if variant == 1:                 # + dynamic window slice
            out_ref[0, b] = ws[0, :] + ws[WB - 1, :]
            return 0

        hi = (rel >> 7)[:, None]         # [128, 1]
        lo = rel & 127
        if variant == 4:                 # no-MXU probe: VPU cost only
            pair = jnp.concatenate(
                [jnp.broadcast_to(ws[0][None, :], (LANE, LANE)),
                 jnp.broadcast_to(ws[1][None, :], (LANE, LANE))], axis=1)
            lo2 = lo[:, None]
            ohw = ((l_iota == lo2).astype(jnp.float32) * (1.0 - f)[:, None]
                   + (l_iota == lo2 + 1).astype(jnp.float32) * f[:, None])
            out_ref[0, b] = jnp.sum(ohw * pair, axis=1)
            return 0
        if variant == 5:                 # no-two-hot probe: MXU cost only
            oh0 = (h_iota == hi).astype(jnp.bfloat16)
            oh1 = (h_iota == hi + 1).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            row0 = jnp.zeros((LANE, LANE), jnp.float32)
            row1 = jnp.zeros((LANE, LANE), jnp.float32)
            for part in _split3(ws):
                row0 = row0 + jax.lax.dot_general(
                    oh0, part, dn, preferred_element_type=jnp.float32)
                row1 = row1 + jax.lax.dot_general(
                    oh1, part, dn, preferred_element_type=jnp.float32)
            out_ref[0, b] = (jnp.sum(row0, axis=1) + f
                             + jnp.sum(row1, axis=1))
            return 0
        if variant == 2:
            # one-hot row-pair select on the MXU: each sample's window row
            # and its successor, 3 exact bf16 passes per one-hot (split3)
            # instead of a 6-pass HIGHEST f32 dot
            oh0 = (h_iota == hi).astype(jnp.bfloat16)       # [128, WB]
            oh1 = (h_iota == hi + 1).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            row0 = jnp.zeros((LANE, LANE), jnp.float32)
            row1 = jnp.zeros((LANE, LANE), jnp.float32)
            for part in _split3(ws):
                row0 = row0 + jax.lax.dot_general(
                    oh0, part, dn, preferred_element_type=jnp.float32)
                row1 = row1 + jax.lax.dot_general(
                    oh1, part, dn, preferred_element_type=jnp.float32)
            pair = jnp.concatenate([row0, row1], axis=1)    # [128, 256]
            # two-hot lerp weights over the 256-lane pair: x0 at lane lo,
            # x1 at lane lo+1 (lo==127 crosses into row1's lane 0)
            lo2 = lo[:, None]
            ohw = ((l_iota == lo2).astype(jnp.float32) * (1.0 - f)[:, None]
                   + (l_iota == lo2 + 1).astype(jnp.float32) * f[:, None])
            out_ref[0, b] = jnp.sum(ohw * pair, axis=1)
            return 0

        # variant 3: everything in ONE MXU dot — the two one-hots (row hi
        # and its successor) stack along M, the 3 exact bf16 mantissa
        # parts stack along K (the MXU's f32 accumulation of disjoint-
        # mantissa parts is order-independent and exact), and the lerp
        # folds into one weighted reduce over the stacked result.
        hh = jnp.concatenate([hi, hi + 1], axis=0)          # [256, 1]
        oh = (h3_iota == hh).astype(jnp.bfloat16)           # [256, 3*WB]
        p0, p1, p2 = _split3(ws)
        ws3 = jnp.concatenate([p0, p1, p2], axis=0)         # [3*WB, 128]
        P = jax.lax.dot_general(
            oh, ws3, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [256, 128]
        # weights: top half (1-f)@lo + f@(lo+1) (second term vanishes at
        # lo==127); bottom half f@0 only where lo==127 (the crossover x1
        # lives at lane 0 of the successor row)
        lo2 = lo[:, None]
        wtop = ((l1_iota == lo2).astype(jnp.float32) * (1.0 - f)[:, None]
                + (l1_iota == lo2 + 1).astype(jnp.float32) * f[:, None])
        wbot = jnp.where((lo2 == 127) & (l1_iota == 0),
                         f[:, None], 0.0)
        red = jnp.sum(jnp.concatenate([wtop, wbot], axis=0) * P, axis=1)
        out_ref[0, b] = red[:LANE] + red[LANE:]
        return 0

    jax.lax.fori_loop(0, CB, body, 0, unroll=True)


@lru_cache(maxsize=32)
def _read_fn(C: int, CB: int, SPAN: int, WB: int, R: int,
             variant: int = 2):
    import functools
    kernel = functools.partial(_read_kernel_body, CB=CB, SPAN=SPAN, WB=WB,
                               variant=variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                     # row_start, blk_lo
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, CB, LANE), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),   # rel
            pl.BlockSpec((1, CB, LANE), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),   # f
            pl.BlockSpec(memory_space=pltpu.ANY),    # ext2d [R, 128]
        ],
        out_specs=pl.BlockSpec((1, CB, LANE), lambda c, *_: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SPAN, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, CB, LANE), jnp.float32),
        grid_spec=grid_spec,
    )


def plan_dims(span_blocks: int, cb: int = 32, align8: bool = False):
    """Static kernel dims for a motion bound of `span_blocks` samples per
    output sample: per-block window rows WB and per-chunk slab rows SPAN
    (both sublane-aligned), sized so any within-visit monotone block fits.
    align8 widens the window so the block base row can round down to a
    multiple of 8 (sublane-aligned dynamic slices)."""
    # exact per-block row need: offsets within a block span at most
    # span_blocks*128 samples above blk_min, +1 for the lerp neighbor,
    # +127 for blk_min's sub-row residue -> span_blocks + 2 rows
    WB = span_blocks + 2 + (8 if align8 else 0)
    SPAN = cb * span_blocks + WB + 16
    SPAN = -(-SPAN // 8) * 8
    return WB, SPAN


def pallas_read_lerp(ext2d, p, fr, span_blocks: int, cb: int = 32,
                     variant: int = 2, align8: bool = False):
    """Streaming lerp read from row-layout extended audio.

    ext2d: f32 [R, 128] extended audio (lead-in + audio + clamp tail).
    p:     i32 [T] sample positions in ext coordinates (T % 128 == 0).
    fr:    f32 [T] fractions in [0, 1).
    Returns (values f32 [T], ok bool [T//128]): per-block flag, False for
    blocks whose positions left their chunk slab or block window (callers
    patch those with the canonical gather, as the XLA engines do).
    """
    R = ext2d.shape[0]
    T = p.shape[0]
    K = T // LANE
    CB = cb
    C = -(-K // CB)
    WB, SPAN = plan_dims(span_blocks, cb, align8)
    if R < SPAN:
        # jnp.clip(..., 0, R - SPAN) would return a NEGATIVE row and the
        # slab DMA would read out of bounds; callers must fall back to the
        # gather path for audio shorter than one slab
        raise ValueError(
            f"extended audio has {R} rows but the slab span is {SPAN}; "
            "use the gather path for audio this short")
    if K % CB:
        padK = C * CB - K
        p = jnp.concatenate([p, jnp.broadcast_to(p[-1:], (padK * LANE,))])
        fr = jnp.concatenate([fr, jnp.zeros(padK * LANE, fr.dtype)])

    pw = p.reshape(C, CB, LANE)
    rows = pw >> 7
    row_start = jnp.clip(jnp.min(rows.reshape(C, -1), axis=1) - 1,
                         0, R - SPAN).astype(jnp.int32)
    off = pw - (row_start[:, None, None] << 7)       # [C, CB, 128]
    blk_min = jnp.min(off, axis=2)                   # [C, CB]
    blk_lo = blk_min >> 7
    if align8:
        blk_lo = blk_lo & ~7
    blk_lo = jnp.clip(blk_lo, 0, SPAN - WB).astype(jnp.int32)
    rel = off - (blk_lo[:, :, None] << 7)
    ok = jnp.all((rel >= 0) & (rel <= WB * LANE - 2), axis=2)   # [C, CB]
    rel = jnp.clip(rel, 0, WB * LANE - 2).astype(jnp.int32)

    y = _read_fn(C, CB, SPAN, WB, R, variant)(
        row_start, blk_lo.reshape(-1),
        rel, fr.reshape(C, CB, LANE), ext2d)
    return y.reshape(-1)[:T], ok.reshape(-1)[:K]
