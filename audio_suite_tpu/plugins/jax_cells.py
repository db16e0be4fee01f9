"""Device-accelerated Grid Audio cell generators.

The reference ships ~40 NumPy example cells (grid_audio_app_0.2/examples/);
those run unchanged through plugins/host.py.  This module ports a subset as
vmapped JAX kernels (SURVEY.md §2.2: "port a subset as vmapped JAX demos")
— same generate(sr, duration[, context]) contract, device compute inside.

Use as cells by path (this file works as a plugin: it defines generate()),
or import the individual functions.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

try:
    from ..ops import detmath
except ImportError:
    # the plugin host loads this file as a standalone module (no package
    # context) — exactly like user cell scripts
    from audio_suite_tpu.ops import detmath


@lru_cache(maxsize=32)
def _sine_fn(n: int, sr: int):
    @jax.jit
    def f(freq, gain):
        t = jnp.arange(n, dtype=jnp.float32) * jnp.float32(1.0 / sr)
        return gain * detmath.sin_cycles(freq * t)
    return f


def sine(sr, duration, freq=440.0, gain=0.5):
    n = int(round(sr * duration))
    return np.asarray(_sine_fn(n, int(sr))(jnp.float32(freq),
                                           jnp.float32(gain)))


@lru_cache(maxsize=32)
def _glitch_fn(n: int, sr: int, slices: int):
    @jax.jit
    def f(seed):
        # spectral-dust style texture: noise bursts gated by a shuffled
        # slice mask (a vmapped take on examples/spectral_dust.py's idea)
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        x = 0.4 * jax.random.normal(k1, (n,), jnp.float32)
        slice_len = max(1, n // slices)
        gates = jax.random.bernoulli(k2, 0.45, (slices + 1,))
        g = jnp.repeat(gates.astype(jnp.float32), slice_len)[:n]
        env = jnp.exp(-jnp.mod(jnp.arange(n, dtype=jnp.float32),
                               slice_len) * (6.0 / slice_len))
        return x * g * env
    return f


def glitch_slices(sr, duration, context=None, slices=16, seed=0):
    if context is not None:
        seed = int(seed) + int(context.get("cell_index", 0)) * 7919
    n = int(round(sr * duration))
    return np.asarray(_glitch_fn(n, int(sr), int(slices))(int(seed)))


@lru_cache(maxsize=32)
def _arp_fn(n: int, sr: int, notes: tuple):
    @jax.jit
    def f(root_hz, gain):
        t = jnp.arange(n, dtype=jnp.float32) * jnp.float32(1.0 / sr)
        step = max(1, n // max(1, len(notes)))
        k = jnp.minimum(jnp.arange(n) // step, len(notes) - 1)
        ratios = jnp.asarray(notes, jnp.float32)[k]
        # per-step phase restart keeps pitches clean without clicks
        local = jnp.mod(jnp.arange(n), step).astype(jnp.float32) \
            * jnp.float32(1.0 / sr)
        env = jnp.exp(-local * 8.0)
        return gain * env * detmath.sin_cycles(root_hz * ratios * local)
    return f


def arpeggio(sr, duration, context=None, root_hz=220.0,
             ratios=(1.0, 1.25, 1.5, 2.0), gain=0.4):
    n = int(round(sr * duration))
    return np.asarray(_arp_fn(n, int(sr), tuple(float(r) for r in ratios))(
        jnp.float32(root_hz), jnp.float32(gain)))


def generate(sr, duration, context=None):
    """Default plugin entry: context-aware device-rendered cell."""
    if context is None:
        return sine(sr, duration)
    ci = int(context.get("cell_index", 0))
    if ci % 3 == 0:
        return arpeggio(sr, duration, context)
    if ci % 3 == 1:
        return glitch_slices(sr, duration, context)
    return sine(sr, duration, freq=220.0 * (1 + ci % 4))
