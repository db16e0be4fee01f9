"""XLA's TPU FFT has a cost cliff between 16384 and 32768 (measured 6.3x
for 2x the size at [270, L]).  Does a hand radix-2 DIT split — two
half-length transforms on even/odd samples plus an elementwise twiddle
combine — beat the direct 32768 transform?  Checks numerics vs direct.

    python tools/fft_split.py
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


def rfft_split(x):
    """rfft over the last axis of length L=2M via two length-M rffts."""
    L = x.shape[-1]
    M = L // 2
    Fe = jnp.fft.rfft(x[..., 0::2])           # [.., M/2+1]
    Fo = jnp.fft.rfft(x[..., 1::2])
    # extend to k = 0..M-1 by conjugate symmetry, then append k=M (== k=0)
    def ext(F):
        return jnp.concatenate(
            [F, jnp.conj(F[..., -2:0:-1]), F[..., :1]], axis=-1)  # [.., M+1]
    E = ext(Fe)
    O = ext(Fo)
    k = jnp.arange(M + 1, dtype=jnp.float32)
    tw = jnp.exp(jax.lax.complex(jnp.zeros_like(k),
                                 -2.0 * jnp.float32(np.pi) * k
                                 / jnp.float32(L)))
    return E + tw * O


def irfft_split(Z, L):
    """irfft(Z, L) via two length-M=L/2 irffts."""
    M = L // 2
    Zr = jnp.conj(Z[..., ::-1])               # Z[M-k] conj, k=0..M
    E = (Z + Zr) * 0.5
    k = jnp.arange(M + 1, dtype=jnp.float32)
    itw = jnp.exp(jax.lax.complex(jnp.zeros_like(k),
                                  2.0 * jnp.float32(np.pi) * k
                                  / jnp.float32(L)))
    O = (Z - Zr) * (0.5 * itw)
    ev = jnp.fft.irfft(E[..., : M // 2 + 1], n=M)
    od = jnp.fft.irfft(O[..., : M // 2 + 1], n=M)
    return jnp.stack([ev, od], axis=-1).reshape(*Z.shape[:-1], L)


def main():
    print("device:", jax.devices()[0])
    null = _null_latency()
    print(f"null latency: {null*1e3:.3f} ms")
    E, L = 270, 32768
    rng = np.random.default_rng(0)
    xh = rng.standard_normal((E, L)).astype(np.float32)
    x = jnp.asarray(xh)

    # numerics (on-device direct vs split)
    d = jax.jit(lambda v: jnp.fft.rfft(v))(x)
    s = jax.jit(rfft_split)(x)
    err = float(jnp.max(jnp.abs(d - s)) / jnp.max(jnp.abs(d)))
    print(f"rfft split rel err vs direct: {err:.3e}")
    yd = jax.jit(lambda z: jnp.fft.irfft(z, n=L))(d)
    ys = jax.jit(lambda z: irfft_split(z, L))(d)
    err2 = float(jnp.max(jnp.abs(yd - ys)) / jnp.max(jnp.abs(yd)))
    print(f"irfft split rel err vs direct: {err2:.3e}")

    t = time_device(jax.jit(lambda v: jnp.sum(jnp.abs(jnp.fft.rfft(v)))),
                    x, null=null)
    print(f"direct rfft [270,32768]:      {t*1e3:7.3f} ms")
    t = time_device(jax.jit(lambda v: jnp.sum(jnp.abs(rfft_split(v)))),
                    x, null=null)
    print(f"split  rfft [270,32768]:      {t*1e3:7.3f} ms")

    t = time_device(jax.jit(
        lambda v: jnp.sum(jnp.abs(jnp.fft.irfft(jnp.fft.rfft(v), n=L)))),
        x, null=null)
    print(f"direct rt   [270,32768]:      {t*1e3:7.3f} ms")
    t = time_device(jax.jit(
        lambda v: jnp.sum(jnp.abs(irfft_split(rfft_split(v), L)))),
        x, null=null)
    print(f"split  rt   [270,32768]:      {t*1e3:7.3f} ms")

    # batch scaling sanity: is [540,16384] ~2x of [270,16384]?
    x5 = jnp.asarray(rng.standard_normal((540, 16384)).astype(np.float32))
    t = time_device(jax.jit(
        lambda v: jnp.sum(jnp.abs(jnp.fft.irfft(jnp.fft.rfft(v),
                                                n=16384)))), x5, null=null)
    print(f"direct rt   [540,16384]:      {t*1e3:7.3f} ms")
    x6 = jnp.asarray(rng.standard_normal((1080, 8192)).astype(np.float32))
    t = time_device(jax.jit(
        lambda v: jnp.sum(jnp.abs(jnp.fft.irfft(jnp.fft.rfft(v),
                                                n=8192)))), x6, null=null)
    print(f"direct rt   [1080,8192]:      {t*1e3:7.3f} ms")
    x7 = jnp.asarray(rng.standard_normal((270, 65536)).astype(np.float32))
    t = time_device(jax.jit(
        lambda v: jnp.sum(jnp.abs(irfft_split(rfft_split(v), 65536)))),
        x7, null=null)
    print(f"split  rt   [270,65536]:      {t*1e3:7.3f} ms (one level)")


if __name__ == "__main__":
    main()
