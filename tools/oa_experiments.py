"""Compare overlap-add strategies on the real TPU (bench config-3 shapes).

Strategies:
  scatter  — XLA scatter-add (current default path)
  dus      — lax.fori_loop of dynamic_slice + add + dynamic_update_slice
  pallas   — ops.pallas_oa window kernel (round-1, XLA pre-shift)

Prints one JSON line with best-of-5 wall times.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from audio_suite_tpu.ops import pallas_oa


def t_best(fn, rep=5):
    fn()
    best = float("inf")
    for _ in range(rep):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    E, L = 270, 32768
    out_n = 768000
    out_len = -(-out_n // 1024) * 1024 + L + 1024
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((E, L)).astype(np.float32))
    starts = jnp.asarray(np.sort(rng.integers(0, out_n - 1, E))
                         .astype(np.int32))
    out0 = jnp.zeros(out_len, jnp.float32)

    res = {"E": E, "L": L, "out_len": out_len,
           "device": jax.devices()[0].platform}

    @jax.jit
    def f_scatter(out, vals, starts):
        idx = starts[:, None] + jnp.arange(L, dtype=jnp.int32)
        return out.at[idx.reshape(-1)].add(vals.reshape(-1), mode="drop")

    @jax.jit
    def f_dus(out, vals, starts):
        def body(e, out):
            win = jax.lax.dynamic_slice(out, (starts[e],), (L,))
            return jax.lax.dynamic_update_slice(out, win + vals[e],
                                                (starts[e],))
        return jax.lax.fori_loop(0, E, body, out)

    ref = np.asarray(f_scatter(out0, vals, starts))

    def run_scatter():
        f_scatter(out0, vals, starts).block_until_ready()

    res["scatter_s"] = round(t_best(run_scatter), 5)

    def run_dus():
        f_dus(out0, vals, starts).block_until_ready()

    res["dus_s"] = round(t_best(run_dus), 5)
    res["dus_maxerr"] = float(np.max(np.abs(
        np.asarray(f_dus(out0, vals, starts)) - ref)))

    @jax.jit
    def f_pallas(out, vals, starts):
        return pallas_oa.overlap_add(out, vals, starts, use_pallas=True)

    try:
        def run_pallas():
            f_pallas(out0, vals, starts).block_until_ready()

        res["pallas_s"] = round(t_best(run_pallas), 5)
        res["pallas_maxerr"] = float(np.max(np.abs(
            np.asarray(f_pallas(out0, vals, starts)) - ref)))
    except Exception as e:
        res["pallas_err"] = f"{type(e).__name__}: {e}"

    print(json.dumps(res))


if __name__ == "__main__":
    main()
