"""Measure XLA TPU rfft cost vs transform length at the microsound grain
batch shape (E=270): can non-pow2 buckets (3*2^k, 5*2^k) shrink the padded
grain length (true n is often ~0.6x the pow2 bucket), and what does drawing
the tilted noise directly in the frequency domain save (skips the forward
rfft of the generator)?

All timings subtract a measured null-dispatch latency (K-amortized drain
roundtrip), the same protocol as bench.py.

    python tools/fft_sizes.py
"""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time
import numpy as np
import jax
import jax.numpy as jnp

from audio_suite_tpu.ops import noise

K = 20


def _null_latency():
    f = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((), jnp.float32)
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(K):
        y = f(x)
    float(y)
    return (time.perf_counter() - t0) / K


def time_device(fn, *args, null=0.0):
    y = fn(*args)
    float(y)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            y = fn(*args)
        float(y)
        t = (time.perf_counter() - t0) / K - null
        best = t if best is None else min(best, t)
    return max(1e-9, best)


def main():
    print("device:", jax.devices()[0])
    null = _null_latency()
    print(f"null-dispatch latency (K={K} amortized): {null*1e3:.3f} ms")
    E = 270
    rng = np.random.default_rng(0)

    sizes = [16384, 20480, 24576, 28672, 32768, 40960, 49152, 65536]
    for L in sizes:
        x = jnp.asarray(rng.standard_normal((E, L)).astype(np.float32))
        t = time_device(jax.jit(
            lambda v, n=L: jnp.sum(jnp.abs(jnp.fft.irfft(
                jnp.fft.rfft(v), n=n)))), x, null=null)
        print(f"rfft+irfft [{E}, {L:6d}]: {t*1e3:7.3f} ms "
              f"({t/L*32768*1e3:6.3f} ms normalized to 32768)")

    # tilted-noise: time-domain draw + rfft + shape + irfft (current)
    # vs direct frequency-domain draw + shape + irfft (proposed)
    L = 32768
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, E).astype(np.int32))
    n = jnp.full((E,), 19200, jnp.int32)

    def tilt_time_draw(seed_v, n_v):
        i = jnp.arange(L, dtype=jnp.int32)

        def one(seed, nn):
            w = noise.normal(seed, i, 0)
            w = jnp.where(i < nn, w, 0.0)
            W = jnp.fft.rfft(w)
            r = jnp.arange(L // 2 + 1, dtype=jnp.float32).at[0].set(1.0)
            shape = r ** jnp.float32(-0.5)
            return jnp.fft.irfft(W * shape, n=L)

        return jnp.sum(jnp.abs(jax.vmap(one)(seed_v, n_v)))

    def tilt_freq_draw(seed_v, n_v):
        nf = L // 2 + 1
        k = jnp.arange(nf, dtype=jnp.int32)

        def one(seed, nn):
            wr = noise.normal(seed, k, 0)
            wi = noise.normal(seed, k, 1)
            r = k.astype(jnp.float32).at[0].set(1.0)
            shape = r ** jnp.float32(-0.5)
            W = jax.lax.complex(wr * shape, wi * shape)
            return jnp.fft.irfft(W, n=L)

        return jnp.sum(jnp.abs(jax.vmap(one)(seed_v, n_v)))

    t1 = time_device(jax.jit(tilt_time_draw), seeds, n, null=null)
    t2 = time_device(jax.jit(tilt_freq_draw), seeds, n, null=null)
    print(f"tilted noise, time-domain draw (rfft+irfft): {t1*1e3:7.3f} ms")
    print(f"tilted noise, freq-domain draw (irfft only): {t2*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
