"""Four-step DFT on the MXU — faster than XLA's TPU FFT at grain shapes.

XLA lowers `fft` to a VPU custom call; at the microsound grain batch
[270, 32768] it measures 0.85 ms (rfft) / ~1.2 ms (irfft) on v5e.  The
four-step algorithm (L = M1*M2: inner DFT_M1 as a matmul, pointwise
twiddle, outer DFT_M2 as a matmul) moves ~all the work onto the MXU:
L*(M1+M2) complex MACs per row.  Measured on the same shape
(tools/mxu_fft_bench.py): rfft 0.32 ms (2.7x), roundtrip 0.65 ms vs
2.04 ms — and MORE accurate than XLA's FFT (1.3e-7 vs 3.8e-7 relative
to f64 NumPy), because the HIGHEST-precision matmul reduction carries
f32-faithful products.

The inverse uses the half-spectrum form
    x[n] = (2/L) * Re( sum_{k=0}^{L/2} Z'[k] e^{2pi i n k / L} ),
with Z'[0], Z'[L/2] half-weighted — no Hermitian mirror is materialized
and only the real part of the final stage is computed, so the inverse
costs the same two matmuls as the forward.

Semantics match np.fft.rfft / np.fft.irfft (c2r convention: only the
real parts of the DC/Nyquist bins contribute).  Used for pow2 L >= 16384
on TPU (`use_mxu`); below that, or on CPU, XLA's FFT wins and callers
fall through to jnp.fft.

Parity note: engines route their grain FFTs through spectral._rfft /
_irfft, so the NumPy oracles (np.fft, f64) remain the ground truth; the
mxu path lands CLOSER to them than XLA's fft did.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
_M1 = 128                 # inner DFT size: one MXU tile edge
_MIN_L = 16384            # below this XLA's FFT wins (measured)


def use_mxu(L: int) -> bool:
    """Route length-L transforms through the MXU path?  pow2 sizes with
    M2 = L/128 >= 128, on the TPU backend only (CPU einsum DFT is far
    slower than pocketfft)."""
    if L < _MIN_L or (L & (L - 1)) != 0:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:       # pragma: no cover
        return False


@functools.lru_cache(maxsize=8)
def _fwd_consts(L: int):
    M1, M2 = _M1, L // _M1
    a = np.arange(M1)
    b = np.arange(M2)
    k2 = np.arange(M2 // 2 + 1)
    W1 = np.exp(-2j * np.pi * np.outer(a, a) / M1)           # [a, k1]
    W2 = np.exp(-2j * np.pi * np.outer(b, k2) / M2)          # [b, k2]
    tw = np.exp(-2j * np.pi * np.outer(a, b) / L)            # [k1, b]
    # cache NumPy constants (jnp.asarray inside a trace would leak
    # tracers into the cache); call sites embed them as jit constants.
    # The third entry is the Karatsuba sum table W.r + W.i (host-side).
    f32 = lambda z: (z.real.astype(np.float32), z.imag.astype(np.float32),
                     (z.real + z.imag).astype(np.float32))
    return f32(W1), f32(W2), f32(tw)


@functools.lru_cache(maxsize=8)
def _inv_consts(L: int):
    M1, M2 = _M1, L // _M1
    a = np.arange(M1)
    b = np.arange(M2)
    k2 = np.arange(M2 // 2 + 1)
    V1 = np.exp(2j * np.pi * np.outer(a, a) / M1)            # [k1, a]
    V2 = np.exp(2j * np.pi * np.outer(k2, b) / M2)           # [k2, b]
    itw = np.exp(2j * np.pi * np.outer(a, b) / L)            # [k1, b]
    f32 = lambda z: (z.real.astype(np.float32), z.imag.astype(np.float32),
                     (z.real + z.imag).astype(np.float32))
    return f32(V1), f32(V2), f32(itw)


def _cmatmul3(Ar, Ai, W, sub):
    """Complex x constant-complex contraction with THREE real matmuls
    (Karatsuba): t1 = Ar@Wr, t2 = Ai@Wi, t3 = (Ar+Ai)@(Wr+Wi);
    Re = t1 - t2, Im = t3 - t1 - t2.  `sub` is the einsum subscript.
    One matmul fewer than the naive four; the extra add passes are
    elementwise.  Error grows by at most ~2x over the 4-mult form
    (cancellation in t3 - t1 - t2), still f32-class."""
    Wr, Wi, Ws = W
    t1 = jnp.einsum(sub, Ar, Wr, precision=_HI)
    t2 = jnp.einsum(sub, Ai, Wi, precision=_HI)
    t3 = jnp.einsum(sub, Ar + Ai, Ws, precision=_HI)
    return t1 - t2, t3 - t1 - t2


def rfft(x):
    """np.fft.rfft of real x[..., L] via two MXU matmuls (L pow2,
    L % 16384 == 0 per use_mxu).  Returns complex64 [..., L//2 + 1].

    n = M2*a + b;  k = k1 + M1*k2, k2 in [0, M2/2]:
      C[k1, b] = sum_a x[a, b] W_M1^{a k1}        (real-input matmul)
      D[k1, b] = C[k1, b] * W_L^{k1 b}            (twiddle)
      X[k1 + M1 k2] = sum_b D[k1, b] W_M2^{b k2}  (matmul, half outputs)
    """
    L = x.shape[-1]
    M1, M2 = _M1, L // _M1
    (W1r, W1i, _), W2, (twr, twi, _) = _fwd_consts(L)
    lead = x.shape[:-1]
    xg = x.reshape(*lead, M1, M2)
    Cr = jnp.einsum("...ab,ak->...kb", xg, W1r, precision=_HI)
    Ci = jnp.einsum("...ab,ak->...kb", xg, W1i, precision=_HI)
    Dr = Cr * twr - Ci * twi
    Di = Cr * twi + Ci * twr
    Xr, Xi = _cmatmul3(Dr, Di, W2, "...kb,bq->...qk")
    nf = L // 2 + 1
    Xr = Xr.reshape(*lead, -1)[..., :nf]
    Xi = Xi.reshape(*lead, -1)[..., :nf]
    return jax.lax.complex(Xr, Xi)


def irfft(Z, L: int):
    """np.fft.irfft(Z, n=L) via the half-spectrum four-step (see module
    docstring).  Z complex64 [..., L//2 + 1] -> real f32 [..., L]."""
    M1, M2 = _M1, L // _M1
    (V1r, V1i, _), V2, (itwr, itwi, _) = _inv_consts(L)
    nf = L // 2 + 1
    lead = Z.shape[:-1]
    half = jnp.ones((nf,), jnp.float32).at[0].set(0.5).at[nf - 1].set(0.5)
    Zr = Z.real * half
    Zi = Z.imag * half
    # lay out [..., k2, k1] with k = k1 + M1*k2; pad bins beyond nf with 0
    P = (M2 // 2 + 1) * M1
    pz = ((0, 0),) * len(lead) + ((0, P - nf),)
    Zr = jnp.pad(Zr, pz).reshape(*lead, M2 // 2 + 1, M1)
    Zi = jnp.pad(Zi, pz).reshape(*lead, M2 // 2 + 1, M1)
    Ar, Ai = _cmatmul3(Zr, Zi, V2, "...qk,qb->...kb")
    Er = Ar * itwr - Ai * itwi
    Ei = Ar * itwi + Ai * itwr
    # final stage: real part only
    x = (jnp.einsum("...kb,ka->...ab", Er, V1r, precision=_HI)
         - jnp.einsum("...kb,ka->...ab", Ei, V1i, precision=_HI))
    return (x.reshape(*lead, L) * jnp.float32(2.0 / L)).astype(jnp.float32)
