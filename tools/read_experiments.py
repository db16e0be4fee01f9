"""A/B the varispeed read engines on the current device: XLA blockwise
(one-hot einsum chunk loop) vs the Pallas streaming slab kernel.

    python tools/read_experiments.py [seconds]
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

from audio_suite_tpu.ops import varispeed, pallas_read


def drain(y):
    return float(jnp.sum(jnp.abs(jnp.ravel(y)).astype(jnp.float32)))


def time_device(fn, K=10):
    y = fn()
    drain(y)
    t0 = time.perf_counter()
    for _ in range(K):
        y = fn()
    drain(y)
    return (time.perf_counter() - t0) / K


def make_positions(T, n, seed=3, base=1.3, wow=0.01):
    """Monotone forward positions with a wobbly speed, like an in-visit
    tape trajectory (no jumps -> no patching needed for the A/B)."""
    rng = np.random.default_rng(seed)
    t = np.arange(T)
    spd = base * (1.0 + wow * np.sin(2 * np.pi * 0.4 * t / 48000.0))
    pos = np.cumsum(spd)
    pos = pos % (n - 8)
    # keep strictly monotone within blocks for the test: start again from a
    # fresh ramp (wrap points become "bad blocks" in both engines)
    idx0 = np.floor(pos).astype(np.int32)
    fr = (pos - idx0).astype(np.float32)
    return jnp.asarray(idx0), jnp.asarray(fr)


def main():
    print("device:", jax.devices()[0])
    sr = 48000
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 180.0
    n = int(sr * seconds)
    rng = np.random.default_rng(7)
    audio = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    T = (n // 128) * 128
    idx0, fr = make_positions(T, n)
    span_b = 4
    cap = 256

    # reference gather
    @jax.jit
    def ref(audio, idx0, fr):
        x0 = audio[idx0]
        x1 = audio[jnp.minimum(idx0 + 1, n - 1)]
        return (jnp.float32(1.0) - fr) * x0 + fr * x1

    y_ref = np.asarray(ref(audio, idx0, fr))
    t_ref = time_device(lambda: ref(audio, idx0, fr))
    print(f"pair gather:   {t_ref*1e3:7.2f} ms")

    xla_fn = jax.jit(lambda a, i, f: varispeed._tape_read_blockwise(
        a, i, f, span_b, cap))
    y_xla = np.asarray(xla_fn(audio, idx0, fr))
    t_xla = time_device(lambda: xla_fn(audio, idx0, fr))
    err = np.max(np.abs(y_xla - y_ref))
    print(f"xla blockwise: {t_xla*1e3:7.2f} ms   maxerr {err:.3g}")

    if not pallas_read.read_available():
        print("pallas: unavailable on this backend")
        return

    # extended audio in the kernel's coordinates
    bias = 256
    total = bias + n + 512
    padded = -(-total // 128) * 128
    ext2d = jnp.concatenate([
        jnp.zeros(bias, jnp.float32), audio,
        jnp.full(padded - bias - n, audio[n - 1], jnp.float32)]
    ).reshape(-1, 128)

    cases = [(2, 64, False), (4, 64, False), (5, 64, False)]
    for variant, cb, al in cases:
        fn = jax.jit(
            lambda e, i, f, _cb=cb, _v=variant, _a=al:
            pallas_read.pallas_read_lerp(e, i + bias, f, span_b,
                                         cb=_cb, variant=_v, align8=_a))
        tag = f"v{variant} cb={cb:3d} al={int(al)}"
        try:
            y_p, ok = fn(ext2d, idx0, fr)
        except Exception as exc:
            print(f"pallas {tag}: FAILED {type(exc).__name__}: {exc}")
            continue
        y_p = np.asarray(y_p)
        okm = np.asarray(ok)
        mask = np.repeat(okm, 128)[:T]
        err = (np.max(np.abs(y_p[mask] - y_ref[mask]))
               if variant == 2 else float("nan"))
        t_p = time_device(lambda: fn(ext2d, idx0, fr)[0])
        print(f"pallas {tag}: {t_p*1e3:7.2f} ms   maxerr(ok) {err:.3g}   "
              f"bad blocks {int((~okm).sum())}/{okm.size}")


if __name__ == "__main__":
    main()
