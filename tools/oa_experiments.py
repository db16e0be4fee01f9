"""Compare overlap-add strategies on the real TPU (bench config-3 shapes).

Strategies (ops/pallas_oa.py):
  scatter — XLA scatter-add (round-1 default path)
  dus     — lax.fori_loop of dynamic_slice + add + dynamic_update_slice
  ring    — Pallas streaming ring accumulator (in-kernel sub-tile shift)

Timing is queue-amortized (K back-to-back dispatches, one scalar readback)
because a single jit-call roundtrip through the tunnel costs ~26 ms.
Prints one JSON line.  Measured 2026-08-16 on v5e (270x32768 into 768k):
scatter 92.4 ms, dus 2.36 ms, ring 1.69 ms — all three bit-identical for
sorted starts (sequential accumulation order).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from audio_suite_tpu.ops import pallas_oa as oa


def t_loop(fn, K=10):
    fn()                                    # warm/compile
    t0 = time.perf_counter()
    y = None
    for _ in range(K):
        y = fn()
    _ = float(jnp.sum(y))
    return round((time.perf_counter() - t0 - 0.026) / K * 1000, 3)


def main():
    E, L = 270, 32768
    out_n = 768000
    out_len = oa.ring_out_len(out_n, L)
    rng = np.random.default_rng(0)
    vals = rng.standard_normal((E, L)).astype(np.float32)
    starts_raw = np.sort(rng.integers(0, out_n - 1, E)).astype(np.int64)
    starts = starts_raw - rng.integers(0, 2000, E) + L   # margin + jitter
    rel, nflush, plan = oa.plan_ring(starts, L, out_len)

    res = {"E": E, "L": L, "out_len": out_len,
           "device": jax.devices()[0].platform,
           "ring_feasible": plan.feasible}

    vj = jnp.asarray(vals)
    sj = jnp.asarray(starts.astype(np.int32))
    out0 = jnp.zeros(out_len, jnp.float32)

    ref = np.zeros(out_len, np.float32)
    for e in range(E):
        s = int(starts[e])
        ref[s:s + L] += vals[e]

    @jax.jit
    def f_scatter(out, v):
        idx = sj[:, None] + jnp.arange(L, dtype=jnp.int32)
        return out.at[idx.reshape(-1)].add(v.reshape(-1), mode="drop")

    f_dus = jax.jit(lambda o, v: oa.overlap_add_dus(o, v, sj))
    res["dus_maxerr"] = float(np.max(np.abs(np.asarray(f_dus(out0, vj))
                                            - ref)))
    _ = t_loop(lambda: f_dus(out0, vj), K=2)    # absorb first-call artifact
    res["dus_ms"] = t_loop(lambda: f_dus(out0, vj))
    res["scatter_ms"] = t_loop(lambda: f_scatter(out0, vj))

    if plan.feasible and oa.ring_available():
        f_ring = jax.jit(lambda o, v: oa.ring_overlap_add(o, v, rel, nflush))
        res["ring_maxerr"] = float(np.max(np.abs(
            np.asarray(f_ring(out0, vj)) - ref)))
        res["ring_ms"] = t_loop(lambda: f_ring(out0, vj))

    print(json.dumps(res))


if __name__ == "__main__":
    main()
