"""Can a four-step DFT on the MXU beat XLA's TPU FFT at the microsound
grain shape [E=270, L=32768]?

XLA lowers fft to a VPU custom call (measured 0.85 ms rfft / ~1.2 ms
irfft at this shape).  The four-step algorithm (L = M1*M2: inner DFT_M1
as a matmul, twiddle, outer DFT_M2 as a matmul) puts ~all flops on the
MXU: 270 * 32768 * (128 + 256) complex MACs ~= 27 GF of HIGHEST-precision
matmul — well under a millisecond at v5e rates if the layout cooperates.

    python tools/mxu_fft_bench.py
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

K = 20
HI = jax.lax.Precision.HIGHEST


def _null():
    f = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((), jnp.float32)
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(K):
        y = f(x)
    float(y)
    return (time.perf_counter() - t0) / K


def timeit(fn, *a, null=0.0, reps=4):
    y = fn(*a)
    float(y)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(K):
            y = fn(*a)
        float(y)
        t = (time.perf_counter() - t0) / K - null
        best = t if best is None else min(best, t)
    return max(1e-9, best)


def _dft_consts(L, M1, M2):
    """Host-precomputed DFT/twiddle factor tables (f32)."""
    a = np.arange(M1)
    W1 = np.exp(-2j * np.pi * np.outer(a, a) / M1)          # [M1, M1]
    k2 = np.arange(M2 // 2 + 1)
    b = np.arange(M2)
    W2 = np.exp(-2j * np.pi * np.outer(b, k2) / M2)         # [M2, M2/2+1]
    tw = np.exp(-2j * np.pi * np.outer(a, b) / L)           # [M1, M2]
    c = lambda z: (jnp.asarray(z.real.astype(np.float32)),
                   jnp.asarray(z.imag.astype(np.float32)))
    return c(W1), c(W2), c(tw)


def rfft_mxu(x, consts):
    """x f32[E, L], L = M1*M2 -> X c64[E, L/2+1] via two MXU matmuls.

    n = M2*a + b (a in [0,M1), b in [0,M2)); k = k1 + M1*k2 with
    k1 in [0,M1), k2 in [0, M2/2]:
      C[k1, b]  = sum_a x[M2 a + b] W_M1^{a k1}          (matmul, real in)
      C'[k1, b] = C[k1, b] * W_L^{b k1}                  (twiddle)
      X[k1 + M1 k2] = sum_b C'[k1, b] W_M2^{b k2}        (matmul)
    Output laid out [E, k2, k1] -> reshape -> first L/2+1 bins.
    """
    (W1r, W1i), (W2r, W2i), (twr, twi) = consts
    E, L = x.shape
    M1 = W1r.shape[0]
    M2 = twr.shape[1]
    xg = x.reshape(E, M1, M2)                               # [E, a, b]
    Cr = jnp.einsum("eab,ak->ekb", xg, W1r, precision=HI)   # [E, k1, b]
    Ci = jnp.einsum("eab,ak->ekb", xg, W1i, precision=HI)
    Dr = Cr * twr[None] - Ci * twi[None]
    Di = Cr * twi[None] + Ci * twr[None]
    Xr = (jnp.einsum("ekb,bq->eqk", Dr, W2r, precision=HI)
          - jnp.einsum("ekb,bq->eqk", Di, W2i, precision=HI))
    Xi = (jnp.einsum("ekb,bq->eqk", Dr, W2i, precision=HI)
          + jnp.einsum("ekb,bq->eqk", Di, W2r, precision=HI))
    nf = L // 2 + 1
    return (Xr.reshape(E, -1)[:, :nf], Xi.reshape(E, -1)[:, :nf])


def irfft_mxu(Zr, Zi, consts_inv, L):
    """Z c64[E, L/2+1] (Hermitian half) -> x f32[E, L].

    Full spectrum via conjugate symmetry, then the inverse four-step with
    +i twiddles; only the real part of the final stage is computed.
    """
    (V1r, V1i), (V2r, V2i), (itwr, itwi) = consts_inv
    E = Zr.shape[0]
    M2 = V2r.shape[0]
    M1 = V1r.shape[0]
    # full length-L spectrum [E, k2, k1] with k = k1 + M1 k2
    Zfr = jnp.concatenate([Zr, Zr[:, 1:-1][:, ::-1]], axis=1)
    Zfi = jnp.concatenate([Zi, -Zi[:, 1:-1][:, ::-1]], axis=1)
    Zg_r = Zfr.reshape(E, M2, M1)                           # [E, k2, k1]
    Zg_i = Zfi.reshape(E, M2, M1)
    # stage A: over k2 -> b:  D[k1, b] = sum_k2 Z[k2, k1] V_M2^{b k2}
    Dr = jnp.einsum("eqk,qb->ekb", Zg_r, V2r, precision=HI) \
        - jnp.einsum("eqk,qb->ekb", Zg_i, V2i, precision=HI)
    Di = jnp.einsum("eqk,qb->ekb", Zg_r, V2i, precision=HI) \
        + jnp.einsum("eqk,qb->ekb", Zg_i, V2r, precision=HI)
    # twiddle: * V_L^{b k1}
    Er = Dr * itwr[None] - Di * itwi[None]
    Ei = Dr * itwi[None] + Di * itwr[None]
    # stage B: over k1 -> a, real part only: x[M2 a + b]
    xr = jnp.einsum("ekb,ka->eab", Er, V1r, precision=HI) \
        - jnp.einsum("ekb,ka->eab", Ei, V1i, precision=HI)
    return xr.reshape(E, L) * jnp.float32(1.0 / L)


def _inv_consts(L, M1, M2):
    a = np.arange(M1)
    V1 = np.exp(2j * np.pi * np.outer(a, a) / M1)           # [M1, M1] (k1,a)
    k2 = np.arange(M2)
    b = np.arange(M2)
    V2 = np.exp(2j * np.pi * np.outer(k2, b) / M2)          # [M2, M2]
    itw = np.exp(2j * np.pi * np.outer(a, b) / L)           # [k1, b]
    c = lambda z: (jnp.asarray(z.real.astype(np.float32)),
                   jnp.asarray(z.imag.astype(np.float32)))
    return c(V1), c(V2), c(itw)


def main():
    print("device:", jax.devices()[0])
    null = _null()
    print(f"null {null*1e3:.2f} ms")
    E, L = 270, 32768
    M1, M2 = 128, 256
    rng = np.random.default_rng(0)
    xh = rng.standard_normal((E, L)).astype(np.float32)
    x = jnp.asarray(xh)
    cf = _dft_consts(L, M1, M2)
    ci = _inv_consts(L, M1, M2)

    # accuracy vs f64 NumPy
    Xr, Xi = jax.jit(lambda v: rfft_mxu(v, cf))(x)
    ref = np.fft.rfft(xh.astype(np.float64))
    got = np.asarray(Xr) + 1j * np.asarray(Xi)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"rfft_mxu rel err vs np(f64):  {err:.2e}")
    # complex64 outputs can't cross the tunnel (UNIMPLEMENTED backend
    # path) — split re/im inside the jit
    xr_, xi_ = jax.jit(
        lambda v: (jnp.fft.rfft(v).real, jnp.fft.rfft(v).imag))(x)
    xla = np.asarray(xr_) + 1j * np.asarray(xi_)
    errx = np.max(np.abs(xla - ref)) / np.max(np.abs(ref))
    print(f"XLA fft  rel err vs np(f64):  {errx:.2e}")

    y = jax.jit(lambda zr, zi: irfft_mxu(zr, zi, ci, L))(Xr, Xi)
    yref = np.fft.irfft(ref, n=L)
    erri = np.max(np.abs(np.asarray(y) - yref)) / np.max(np.abs(yref))
    print(f"irfft_mxu roundtrip rel err:  {erri:.2e}")

    t = timeit(jax.jit(lambda v: jnp.sum(jnp.abs(jnp.fft.rfft(v)))),
               x, null=null)
    print(f"XLA rfft:       {t*1e3:7.3f} ms")
    t = timeit(jax.jit(
        lambda v: sum(jnp.sum(jnp.abs(p)) for p in rfft_mxu(v, cf))),
        x, null=null)
    print(f"MXU rfft:       {t*1e3:7.3f} ms")
    t = timeit(jax.jit(
        lambda v: jnp.sum(jnp.abs(jnp.fft.irfft(jnp.fft.rfft(v), n=L)))),
        x, null=null)
    print(f"XLA roundtrip:  {t*1e3:7.3f} ms")

    def rt_mxu(v):
        Zr, Zi = rfft_mxu(v, cf)
        return jnp.sum(jnp.abs(irfft_mxu(Zr, Zi, ci, L)))

    t = timeit(jax.jit(rt_mxu), x, null=null)
    print(f"MXU roundtrip:  {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()


def rfft_mxu_b(x, M1, M2):
    """Variant B: n = M1*b + a, k = k2 + M2*k1 — the outer matmul
    contracts the LANE dim (a) and the half-spectrum cut halves the
    M1-side instead of the M2-side."""
    E, L = x.shape
    a = np.arange(M1)
    b = np.arange(M2)
    k1 = np.arange(M1 // 2 + 1)
    W2 = np.exp(-2j * np.pi * np.outer(b, b) / M2)       # [b, k2]
    tw = np.exp(-2j * np.pi * np.outer(b, a) / L)        # [k2, a]
    W1h = np.exp(-2j * np.pi * np.outer(a, k1) / M1)     # [a, k1]
    W2r, W2i = W2.real.astype(np.float32), W2.imag.astype(np.float32)
    twr, twi = tw.real.astype(np.float32), tw.imag.astype(np.float32)
    W1r_, W1i_ = W1h.real.astype(np.float32), W1h.imag.astype(np.float32)
    xg = x.reshape(E, M2, M1)
    Cr = jnp.einsum("...ba,bq->...qa", xg, W2r, precision=HI)
    Ci = jnp.einsum("...ba,bq->...qa", xg, W2i, precision=HI)
    Dr = Cr * twr - Ci * twi
    Di = Cr * twi + Ci * twr
    Xr = (jnp.einsum("...qa,ak->...kq", Dr, W1r_, precision=HI)
          - jnp.einsum("...qa,ak->...kq", Di, W1i_, precision=HI))
    Xi = (jnp.einsum("...qa,ak->...kq", Dr, W1i_, precision=HI)
          + jnp.einsum("...qa,ak->...kq", Di, W1r_, precision=HI))
    nf = L // 2 + 1
    return (Xr.reshape(E, -1)[:, :nf], Xi.reshape(E, -1)[:, :nf])


def variants():
    print("device:", jax.devices()[0])
    null = _null()
    print(f"null {null*1e3:.2f} ms")
    E, L = 270, 32768
    rng = np.random.default_rng(0)
    xh = rng.standard_normal((E, L)).astype(np.float32)
    x = jnp.asarray(xh)
    ref = np.fft.rfft(xh.astype(np.float64))

    for M1, M2 in ((128, 256), (256, 128), (64, 512)):
        cf = _dft_consts(L, M1, M2)
        f = jax.jit(lambda v, c=cf: sum(jnp.sum(jnp.abs(p))
                                        for p in rfft_mxu(v, c)))
        t = timeit(f, x, null=null)
        g = jax.jit(lambda v, c=cf: rfft_mxu(v, c))
        got = np.asarray(g(x)[0]) + 1j * np.asarray(g(x)[1])
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"A M1={M1:3d} M2={M2:3d}: {t*1e3:7.3f} ms  err {err:.1e}")

    for M1, M2 in ((128, 256), (256, 128)):
        f = jax.jit(lambda v: sum(jnp.sum(jnp.abs(p))
                                  for p in rfft_mxu_b(v, M1, M2)))
        t = timeit(f, x, null=null)
        g = jax.jit(lambda v: rfft_mxu_b(v, M1, M2))
        got = np.asarray(g(x)[0]) + 1j * np.asarray(g(x)[1])
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"B M1={M1:3d} M2={M2:3d}: {t*1e3:7.3f} ms  err {err:.1e}")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "variants":
    variants()
