"""Counter-based deterministic noise (JAX + NumPy twins).

Microsound's grain generators draw per-sample randomness inside the event
loop (microsound_0.2.1/main_v2.py:219-331, seeded ``seed + i`` per event).
NumPy Generator streams can't be reproduced on device, so the framework
defines its own noise source: a stateless murmur3-finalizer hash of
(seed, index, stream) producing uniforms, with Irwin-Hall(12) Gaussians —
integer and single-rounding f32 ops only, bit-identical between NumPy and
XLA, and embarrassingly parallel (no sequential RNG state).

Same distributions as the reference; different streams (documented framework
semantics — the oracle uses these same twins).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_GOLDEN = np.uint32(0x9E3779B9)
_INV24 = np.float32(1.0 / (1 << 24))


def _mix_j(h):
    h = h ^ (h >> 16)
    h = h * _M1
    h = h ^ (h >> 13)
    h = h * _M2
    h = h ^ (h >> 16)
    return h


def hash_u32(seed, idx, stream=0):
    """uint32 hash of (seed, idx, stream) — JAX."""
    h = (jnp.asarray(seed, jnp.uint32) * _GOLDEN
         + jnp.asarray(idx, jnp.uint32) * _M1
         + jnp.asarray(stream, jnp.uint32) * _M2)
    return _mix_j(h)


def hash_u32_np(seed, idx, stream=0):
    seed = np.asarray(seed, np.uint32)
    idx = np.asarray(idx, np.uint32)
    stream = np.asarray(stream, np.uint32)
    with np.errstate(over="ignore"):
        h = seed * _GOLDEN + idx * _M1 + stream * _M2
        h = h ^ (h >> np.uint32(16))
        h = h * _M1
        h = h ^ (h >> np.uint32(13))
        h = h * _M2
        h = h ^ (h >> np.uint32(16))
    return h


def uniform(seed, idx, stream=0):
    """f32 uniform in [0, 1): top 24 bits * 2**-24 (exact scale)."""
    return (hash_u32(seed, idx, stream) >> 8).astype(jnp.float32) * _INV24


def uniform_np(seed, idx, stream=0):
    return ((hash_u32_np(seed, idx, stream) >> np.uint32(8))
            .astype(np.float32) * _INV24)


def uniform_signed(seed, idx, stream=0):
    """f32 uniform in [-1, 1)."""
    return uniform(seed, idx, stream) * jnp.float32(2.0) - jnp.float32(1.0)


def uniform_signed_np(seed, idx, stream=0):
    return uniform_np(seed, idx, stream) * np.float32(2.0) - np.float32(1.0)


def normal(seed, idx, stream=0):
    """Irwin-Hall(12) standard normal: sum of 12 uniforms - 6."""
    acc = jnp.zeros(jnp.broadcast_shapes(np.shape(seed), np.shape(idx)),
                    jnp.float32)
    for k in range(12):
        acc = acc + uniform(seed, idx, stream * 12 + k + 1)
    return acc - jnp.float32(6.0)


def normal_np(seed, idx, stream=0):
    acc = np.zeros(np.broadcast_shapes(np.shape(seed), np.shape(idx)),
                   np.float32)
    for k in range(12):
        acc = acc + uniform_np(seed, idx, stream * 12 + k + 1)
    return (acc - np.float32(6.0)).astype(np.float32)
