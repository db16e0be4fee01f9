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


_INV16 = np.float32(1.0 / (1 << 16))
_IH4_SCALE = np.float32(np.sqrt(3.0) / 256.0)
_MASK16 = np.uint32(0xFFFF)
_MASK8 = np.uint32(0xFF)


def uniform_pair(seed, idx, stream=0):
    """TWO f32 uniforms in [0, 1) from ONE hash: hi/lo 16 bits.

    Granularity 2**-16 (vs 2**-24 for `uniform`) — fine for Bernoulli
    thresholds down to ~1e-4; do NOT use for rare events (e.g. the CA's
    lightning_rate ~3e-6).  Halves the hash work of two independent draw
    sites; streams are distinct from any single-site stream by
    construction only if callers keep site ids disjoint (the CA does)."""
    h = hash_u32(seed, idx, stream)
    return ((h >> 16).astype(jnp.float32) * _INV16,
            (h & _MASK16).astype(jnp.float32) * _INV16)


def uniform_pair_np(seed, idx, stream=0):
    h = hash_u32_np(seed, idx, stream)
    return (((h >> np.uint32(16)).astype(np.float32) * _INV16),
            ((h & _MASK16).astype(np.float32) * _INV16))


def normal_ih4(seed, idx, stream=0):
    """Approximate standard normal from ONE hash: Irwin-Hall(4) over the
    hash's four bytes, centered and scaled by sqrt(12/4)/256.  12x cheaper
    than `normal` (1 hash vs 12); granularity sqrt(3)/256 ~ 0.0068 and
    support [-3.45, 3.45] — adequate wherever the consumer quantizes or
    discretizes the draw anyway (the CA's ember jitter is q12-rounded then
    floored to integer cell offsets).  All ops exact in f32 (integer sum
    <= 1020, single rounding on the final scale), so the NumPy twin is
    bit-identical."""
    h = hash_u32(seed, idx, stream)
    s = ((h & _MASK8) + ((h >> 8) & _MASK8)
         + ((h >> 16) & _MASK8) + (h >> 24))
    return (s.astype(jnp.float32) - jnp.float32(510.0)) * _IH4_SCALE


def normal_ih4_np(seed, idx, stream=0):
    h = hash_u32_np(seed, idx, stream)
    s = ((h & _MASK8) + ((h >> np.uint32(8)) & _MASK8)
         + ((h >> np.uint32(16)) & _MASK8) + (h >> np.uint32(24)))
    return ((s.astype(np.float32) - np.float32(510.0))
            * _IH4_SCALE).astype(np.float32)


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
