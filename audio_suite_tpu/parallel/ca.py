"""Spatially-sharded Forest Fire CA: the grid's rows distributed over a
mesh axis with halo exchange — the 2-D stencil analog of the timeline
sharding in parallel/timeline.py.

The reference simulates a fixed 220x160 grid on one CPU
(forest_fire_OSC_0.1/model.py:13-14); this module scales the same CA to
grids that exceed one chip's HBM or step-rate budget by sharding the row
axis over a `jax.sharding.Mesh` axis.  Everything spatially coupled
crosses the shard boundary through exactly three collectives per step:

- **stencil halo**: the 8-neighbour fire mask needs one row from each
  vertical neighbour; a `ppermute` ring ships the edge rows (toroidal,
  matching `jnp.roll`'s wrap semantics exactly),
- **ember candidates**: each shard top_k-compacts its local emitters
  (same EMBER_CAP discipline as the dense engine), one `all_gather`
  shares the (emitter-index, landing-index) candidate lists, and a
  replicated global top_k reproduces the dense engine's selection — so
  arrivals land on their owning shard no matter how far the wind blew
  them (ember jitter is unbounded, so a fixed halo cannot carry them),
- **stats**: per-shard partial counts `psum` into the global stat row.

Bit-exactness is structural, not aspirational: the per-cell physics is
THE SAME CODE as the single-device engine (models/forestfire.step_device
with a ShardSpatial adapter instead of DenseSpatial) and every cross-
shard quantity is integer/boolean, so the sharded trajectory equals the
dense trajectory bit-for-bit (asserted on the 8-virtual-device CPU mesh
in tests/test_parallel.py).

Requires params.h divisible by the mesh axis size.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import forestfire as ff
from .batch import shard_map


class ShardSpatial(ff.DenseSpatial):
    """Row-sharded spatial coupling: local blocks are [H/D, W]."""

    def __init__(self, axis: str, H: int, W: int, D: int):
        self.axis, self.H, self.W, self.D = axis, H, W, D
        self.Hl = H // D

    def _row0(self):
        return jax.lax.axis_index(self.axis).astype(jnp.int32) * self.Hl

    def cells(self, H: int, W: int):
        # uint32 throughout: an int32 intermediate would overflow (and fork
        # the per-cell RNG streams off the dense engine) once H*W >= 2^31
        local = jnp.arange(self.Hl * W, dtype=jnp.uint32) \
            .reshape(self.Hl, W)
        return local + self._row0().astype(jnp.uint32) * jnp.uint32(W)

    def rows(self, H: int):
        return self._row0() + jnp.arange(self.Hl, dtype=jnp.int32)[:, None]

    def roll_or8(self, m):
        """8-neighbour OR with a one-row toroidal halo per vertical
        neighbour (column rolls stay shard-local)."""
        D = self.D
        m8 = m.astype(jnp.int8)       # collectives on bool are backend-iffy
        # each shard sends its LAST row to the next shard -> every shard
        # receives its previous shard's last row (the row "above" it,
        # toroidally), and vice versa for the row below
        top = jax.lax.ppermute(m8[-1:, :], self.axis,
                               [(j, (j + 1) % D) for j in range(D)])
        bot = jax.lax.ppermute(m8[:1, :], self.axis,
                               [(j, (j - 1) % D) for j in range(D)])
        ext = jnp.concatenate([top, m8, bot], axis=0)    # [Hl + 2, W]
        dn = ext[:-2]                  # == jnp.roll(m, 1, 0) local block
        up = ext[2:]                   # == jnp.roll(m, -1, 0) local block
        out = (dn | up
               | jnp.roll(m8, 1, 1) | jnp.roll(m8, -1, 1)
               | jnp.roll(dn, 1, 1) | jnp.roll(dn, -1, 1)
               | jnp.roll(up, 1, 1) | jnp.roll(up, -1, 1))
        return out.astype(bool)

    def ember_arrivals(self, emit, lin, H: int, W: int):
        """Dense-engine-equal ember selection across shards.

        The dense engine keeps the EMBER_CAP largest emitter linear
        indices grid-wide.  Per-shard top_k keeps each shard's largest
        min(EMBER_CAP, Hl*W) — a superset cover of the global top set —
        then the all_gather'd candidates are re-top_k'd identically on
        every shard, so the selected emitter set matches the dense
        engine exactly even when the cap binds."""
        Hl, D = self.Hl, self.D
        capl = min(ff.EMBER_CAP, Hl * W)
        gcap = min(ff.EMBER_CAP, H * W)
        gidx = (self._row0() * W
                + jnp.arange(Hl * W, dtype=jnp.int32))
        key = jnp.where(emit.reshape(-1), gidx, -1)
        vals, pos = jax.lax.top_k(key, capl)
        land = lin.reshape(-1)[jnp.clip(pos, 0, Hl * W - 1)]
        land = jnp.where(vals >= 0, land, -1)
        cand_v = jax.lax.all_gather(vals, self.axis).reshape(-1)
        cand_l = jax.lax.all_gather(land, self.axis).reshape(-1)
        gv, gpos = jax.lax.top_k(cand_v, min(gcap, D * capl))
        gl = cand_l[gpos]
        ok = gv >= 0
        rel = gl - self._row0() * W                      # local landing
        in_rng = ok & (rel >= 0) & (rel < Hl * W)
        arrivals = jnp.zeros(Hl * W, jnp.int32) \
            .at[jnp.clip(rel, 0, Hl * W - 1)].add(in_rng.astype(jnp.int32))
        return (arrivals > 0).reshape(Hl, W)

    def rsum(self, x):
        return jax.lax.psum(jnp.sum(x.astype(jnp.int32)), self.axis)


def _carry_specs(axis: str):
    pspec = P(axis, None)
    return {"state": pspec, "fuel": pspec, "moisture": pspec,
            "elev": pspec, "age": pspec, "t": P()}


def sharded_sim_fn(params: ff.ModelParams, seed: int, n_steps: int,
                   mesh: Mesh, axis: str = "sp"):
    """jit-compiled `(carry, terrain) -> (carry', stats[n_steps, 8])` with
    the grid's row axis sharded over `axis`."""
    D = int(mesh.shape[axis])
    H, W = int(params.h), int(params.w)
    if H % D:
        raise ValueError(f"grid h={H} must divide over the {D}-device "
                         f"'{axis}' mesh axis")
    sp = ShardSpatial(axis, H, W, D)
    pspec = P(axis, None)
    t_specs = {"slope_boost": pspec, "wind_boost": pspec,
               "baseline": pspec}

    def run(carry, terrain):
        t0 = carry["t"]
        carry, stats = jax.lax.scan(
            lambda c, k: ff.step_device(c, t0 + k, params, seed, terrain,
                                        spatial=sp),
            carry, jnp.arange(n_steps, dtype=jnp.int32))
        return carry, stats

    fn = shard_map(run, mesh,
                   in_specs=(_carry_specs(axis), t_specs),
                   out_specs=(_carry_specs(axis), P()))
    return jax.jit(fn)


def simulate_sharded(params: ff.ModelParams, carry: dict, n_steps: int,
                     mesh: Mesh, seed: int, axis: str = "sp"):
    """Run `n_steps` of the CA with rows sharded over `mesh[axis]`.

    `carry`: the state dict from models.forestfire.init_state (or a
    ForestFireModel's host state).  Returns (carry', stats [n_steps, 8]);
    carry' fields stay device-sharded for chaining, stats is replicated.
    Bit-identical to ForestFireModel.simulate on the same carry/seed."""
    pspec = P(axis, None)
    elev = np.asarray(carry["elev"], np.float32)
    terrain_h = jax.jit(lambda e: ff.terrain_static(params, e))(elev)
    dev_c = {}
    for k, v in carry.items():
        s = NamedSharding(mesh, P() if np.ndim(v) == 0 else pspec)
        dev_c[k] = jax.device_put(
            jnp.asarray(v) if np.ndim(v) else jnp.int32(v), s)
    terrain = {k: jax.device_put(v, NamedSharding(mesh, pspec))
               for k, v in terrain_h.items()}
    carry2, stats = sharded_sim_fn(params, int(seed), int(n_steps),
                                   mesh, axis)(dev_c, terrain)
    return carry2, np.asarray(stats)
