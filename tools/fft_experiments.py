"""FFT strategy experiments at the microsound grain shape [E, 32768]:
does XLA's TPU rfft already exploit real symmetry (cost ~0.5x complex fft),
and does packing two real rows into one complex row win?

Every timed function reduces to a REAL scalar inside the jit (complex64
arrays crossing kernel boundaries hit an UNIMPLEMENTED TPU backend path
through this tunnel); the shared reduction cost cancels in comparisons.

    python tools/fft_experiments.py
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


def creduce(z):
    return jnp.sum(jnp.abs(jnp.real(z))) + jnp.sum(jnp.abs(jnp.imag(z)))


def time_device(fn, *args, K=40):
    y = fn(*args)
    float(y)
    t0 = time.perf_counter()
    for _ in range(K):
        y = fn(*args)
    float(y)
    return (time.perf_counter() - t0) / K


def main():
    print("device:", jax.devices()[0])
    E, L = 270, 32768
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((E, L)).astype(np.float32))
    zr = rng.standard_normal((E // 2, L)).astype(np.float32)
    zi = rng.standard_normal((E // 2, L)).astype(np.float32)
    zr = jnp.asarray(zr)
    zi = jnp.asarray(zi)

    t0 = time_device(jax.jit(lambda v: jnp.sum(jnp.abs(v))), x)
    print(f"reduce only [270, 32768]:    {t0*1e3:.2f} ms")

    t = time_device(jax.jit(lambda v: creduce(jnp.fft.rfft(v))), x)
    print(f"rfft [270, 32768]:           {t*1e3:.2f} ms")
    t = time_device(jax.jit(
        lambda v: jnp.sum(jnp.abs(jnp.fft.irfft(jnp.fft.rfft(v), n=L)))), x)
    print(f"rfft+irfft [270, 32768]:     {t*1e3:.2f} ms")
    t = time_device(jax.jit(
        lambda a, b: creduce(jnp.fft.fft(jax.lax.complex(a, b)))), zr, zi)
    print(f"cfft [135, 32768]:           {t*1e3:.2f} ms")
    t = time_device(jax.jit(
        lambda a, b: creduce(jnp.fft.ifft(jnp.fft.fft(
            jax.lax.complex(a, b))))), zr, zi)
    print(f"cfft+icfft [135, 32768]:     {t*1e3:.2f} ms")

    # packed: two real rows as one complex row, unpack via symmetry
    def rfft_packed(v):
        zz = jax.lax.complex(v[0::2], v[1::2])
        Z = jnp.fft.fft(zz)
        Zr = jnp.concatenate([Z[:, :1], Z[:, :0:-1]], axis=1)
        A = (Z + jnp.conj(Zr)) * 0.5
        B = (Z - jnp.conj(Zr)) * (-0.5j)
        return creduce(A[:, :L // 2 + 1]) + creduce(B[:, :L // 2 + 1])

    t = time_device(jax.jit(rfft_packed), x)
    print(f"packed rfft [270->135 cplx]: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
