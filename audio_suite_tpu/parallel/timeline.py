"""Timeline sharding: one long render distributed across chips.

SURVEY.md §5 ("long-context") calls for chunked/blockwise rendering plus
optional sharding of a single long timeline across chips with halo exchange
at block edges — the audio analog of context parallelism.  This module
implements the core primitive: CAUSAL FIR CONVOLUTION (the Microsound
IR / early-reflection path, ops/space.fft_convolve_causal) over a signal
whose time axis is sharded over a mesh axis.

Each device convolves its local block with the kernel (partitioned FFT,
local compute); the convolution tail that spills past the block edge is
passed to the RIGHT neighbor over ICI with a single ppermute and added to
its head.  For K <= block_len the halo is one hop; the general case loops
hops (K-1)//block_len + 1 times.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.space import fft_convolve_causal
from .batch import shard_map


def sharded_fir_conv(x, kernel, mesh: Mesh, axis: str = "dp"):
    """y[:len(x)] of np.convolve(x, kernel) with x's time axis sharded
    over `axis`.  x: f32[N] (N divisible by the axis size), kernel: f32[K].
    Returns a device array laid out with the same sharding."""
    n_dev = mesh.shape[axis]
    N = x.shape[0]
    K = kernel.shape[0]
    if N % n_dev != 0:
        raise ValueError(f"N={N} must divide over {n_dev} devices")
    block = N // n_dev
    hops = (K - 1) // block + 1 if K > 1 else 0

    def local(xb, kb):
        # full local convolution: len block + K - 1
        full_len = block + K - 1
        nfft = 1
        while nfft < full_len:
            nfft *= 2
        Y = jnp.fft.irfft(jnp.fft.rfft(xb, n=nfft)
                          * jnp.fft.rfft(kb, n=nfft), n=nfft)[:full_len]
        y = Y[:block]
        tail = Y[block:]                       # length K - 1 spill
        # pad tail to a whole number of blocks for hop-wise exchange
        pad = hops * block - (K - 1)
        tail = jnp.concatenate([tail, jnp.zeros(pad, jnp.float32)])
        idx = jax.lax.axis_index(axis)
        n_ax = jax.lax.axis_size(axis)
        for h in range(hops):
            seg = tail[h * block:(h + 1) * block]
            # send segment h+1 blocks to the right; wraps deliver zeros
            shifted = jax.lax.ppermute(
                seg, axis,
                [(i, (i + h + 1) % n_ax) for i in range(n_ax)])
            # a segment that wrapped past the last device must not alias
            # back onto the start of the timeline
            valid = idx >= (h + 1)
            y = y + jnp.where(valid, shifted, 0.0)
        return y

    f = shard_map(local, mesh, in_specs=(P(axis), P()), out_specs=P(axis))
    xs = jax.device_put(jnp.asarray(x, jnp.float32),
                        NamedSharding(mesh, P(axis)))
    kb = jnp.asarray(kernel, jnp.float32)
    return jax.jit(f)(xs, kb)


def sharded_conv_reference(x, kernel):
    """Single-device reference for tests."""
    return np.asarray(fft_convolve_causal(jnp.asarray(x, jnp.float32),
                                          jnp.asarray(kernel, jnp.float32)))
