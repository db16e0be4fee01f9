"""Pallas TPU kernel: overlap-add accumulation of event buffers.

XLA lowers `out.at[idx].add(vals)` with arbitrary indices to a generic
scatter (~0.17 s for 270x32768 grains on v5e).  But overlap-add is not a
general scatter: each event contributes one CONTIGUOUS window at a known
start.  The Pallas kernel walks events on the sequential TPU grid and
read-modify-writes each window in HBM via async DMA through a VMEM
scratch — turning 8.8M scattered adds into ~E streamed window updates.

Accumulation order is per-event sequential (deterministic); f32 sums can
differ from XLA's scatter order by ~1 ulp per overlap, far below the
-60 dBFS parity budget (engines' tests pass against the NumPy oracles
either way).  Falls back to the scatter path on CPU or if pallas fails.

MEASURED (v5e, 270x32768 grains into a 800k buffer): this kernel runs in
~0.12 s vs ~0.11 s for XLA's scatter — the XLA-side pre-shift gather
(1D HBM DMA slices must be 1024-aligned, so sub-tile offsets are applied
as a vectorized roll before the kernel) eats the window-streaming win.
The engines therefore keep the XLA scatter by default; pass
use_pallas=True to overlap_add to opt in.  Next iteration: double-buffer
the window DMAs and fold the sub-tile shift into the DMA descriptor.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:       # pragma: no cover
    _HAVE_PALLAS = False


_ALIGN = 1024   # f32 1D HBM tiling: DMA slices must be ALIGN-sized/offset


def _kernel(starts_ref, vals_ref, out_in_ref, out_ref, win, row, sem_win,
            sem_row, sem_out):
    # rows arrive pre-shifted to their sub-tile offset (XLA-side roll), so
    # every DMA here is tile-aligned: window = out[start & ~1023 : +W]
    e = pl.program_id(0)
    aligned = pl.multiple_of(starts_ref[e], _ALIGN)
    W = win.shape[0]

    dma_row = pltpu.make_async_copy(vals_ref.at[pl.ds(e * W, W)], row,
                                    sem_row)
    dma_row.start()
    dma_win = pltpu.make_async_copy(out_ref.at[pl.ds(aligned, W)], win,
                                    sem_win)
    dma_win.start()
    dma_row.wait()
    dma_win.wait()
    win[:] = win[:] + row[:]
    dma_out = pltpu.make_async_copy(win, out_ref.at[pl.ds(aligned, W)],
                                    sem_out)
    dma_out.start()
    dma_out.wait()
    del out_in_ref


@lru_cache(maxsize=16)
def _oa_fn(E: int, L: int, out_len: int):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # vals (HBM, DMA'd)
            pl.BlockSpec(memory_space=pltpu.ANY),     # out (aliased, HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((L + _ALIGN,), jnp.float32),
            pltpu.VMEM((L + _ALIGN,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    fn = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((out_len,), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},   # (after scalar prefetch) out_in -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return fn


def overlap_add(out, vals, starts, use_pallas: bool = False):
    """out[starts[e] : starts[e]+L] += vals[e] for each event, on TPU via
    the Pallas window-accumulate kernel; scatter fallback elsewhere.

    out: f32[out_len] (out_len >= max(starts)+L+1024, out_len a multiple
    of 1024); vals: f32[E, L] (L a multiple of 1024 for the Pallas path);
    starts: i32[E] (each in [0, out_len-L-1024]).  Returns the updated
    buffer.
    """
    E, L = vals.shape
    out_len = out.shape[0]
    if (use_pallas and _HAVE_PALLAS and _on_tpu() and L % _ALIGN == 0
            and out_len % _ALIGN == 0):
        W = L + _ALIGN
        starts = starts.astype(jnp.int32)
        aligned = (starts // _ALIGN) * _ALIGN
        off = starts - aligned
        # pre-shift each row by its sub-tile offset: rolled[e, j] =
        # vals[e, j - off_e] for j in [off, off+L), zero elsewhere
        j = jnp.arange(W, dtype=jnp.int32)[None, :]
        src = j - off[:, None]
        valid = (src >= 0) & (src < L)
        rolled = jnp.where(
            valid,
            jnp.take_along_axis(vals, jnp.clip(src, 0, L - 1), axis=1),
            0.0)
        return _oa_fn(E, L, out_len)(aligned, rolled.reshape(-1), out)
    idx = starts[:, None].astype(jnp.int32) + jnp.arange(L, dtype=jnp.int32)
    return out.at[idx.reshape(-1)].add(vals.reshape(-1), mode="drop")


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:       # pragma: no cover
        return False
