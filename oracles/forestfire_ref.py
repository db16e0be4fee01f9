"""NumPy oracle for the Forest Fire CA engine.

Twin of audio_suite_tpu/models/forestfire.py's device step: identical f32
op structure under the exact-multiply discipline (every multiply feeding an
add takes 12-bit-significand operands, so its product is exact and XLA's
FMA contraction on the device cannot change any rounding) and the same
counter-noise streams, so state trajectories must match BIT-EXACTLY — the
CA is chaotic, any deviation cascades.  Semantics are the reference's (forest_fire_OSC_0.1/
model.py:121-222) with counter-based randomness (documented framework
substitution, SURVEY.md §7)."""
from __future__ import annotations

import numpy as np

from audio_suite_tpu.ops import noise
from audio_suite_tpu.models.forestfire import (
    _NRM_OFFSET, _SITES, _S_DIST, _S_EMIT, _S_FUEL_A, _S_FUEL_E, _S_GROW_A,
    _S_GROW_E, _S_IGNITE, _S_JX, _S_JY, _S_LIGHT, _S_RAIN, _S_SPREAD,
    ASH, EMBER_CAP, EMPTY, FIRE, TREE, quantized_consts)
from audio_suite_tpu.ops.fixq import round_sig12_np as q12


def _roll_or8(m):
    return (np.roll(m, 1, 0) | np.roll(m, -1, 0)
            | np.roll(m, 1, 1) | np.roll(m, -1, 1)
            | np.roll(np.roll(m, 1, 0), 1, 1)
            | np.roll(np.roll(m, 1, 0), -1, 1)
            | np.roll(np.roll(m, -1, 0), 1, 1)
            | np.roll(np.roll(m, -1, 0), -1, 1))


def step_np(carry: dict, step_idx: int, params, seed: int):
    p = params
    H, W = p.h, p.w
    state = carry["state"].copy()
    fuel = carry["fuel"].copy()
    moisture = carry["moisture"].copy()
    elev = carry["elev"]
    age = carry["age"].copy()

    cells = np.arange(H * W, dtype=np.uint32).reshape(H, W)
    base = np.uint32(step_idx) * np.uint32(_SITES)

    def u(site, idx=None):
        return noise.uniform_np(np.uint32(seed),
                                cells if idx is None else idx,
                                base + np.uint32(site))

    def nrm(site):
        return noise.normal_np(np.uint32(seed), cells,
                               base + np.uint32(_NRM_OFFSET) + np.uint32(site))

    qc = quantized_consts(p)
    wx, wy = np.float32(qc["wx"]), np.float32(qc["wy"])

    # hoisted draws, twinning models/forestfire.py's two noise modes
    if getattr(p, "fast_noise", False):
        d_spread, d_emit = noise.uniform_pair_np(
            np.uint32(seed), cells, base + np.uint32(_S_SPREAD))
        d_ignite, d_dist = noise.uniform_pair_np(
            np.uint32(seed), cells, base + np.uint32(_S_IGNITE))
        d_grow_e, d_grow_a = noise.uniform_pair_np(
            np.uint32(seed), cells, base + np.uint32(_S_GROW_E))
        d_fuel_e, d_fuel_a = noise.uniform_pair_np(
            np.uint32(seed), cells, base + np.uint32(_S_FUEL_E))
        jx_raw = noise.normal_ih4_np(
            np.uint32(seed), cells, base + np.uint32(_NRM_OFFSET + _S_JX))
        jy_raw = noise.normal_ih4_np(
            np.uint32(seed), cells, base + np.uint32(_NRM_OFFSET + _S_JY))
    else:
        d_spread, d_emit = u(_S_SPREAD), u(_S_EMIT)
        d_ignite, d_dist = u(_S_IGNITE), u(_S_DIST)
        d_grow_e, d_grow_a = u(_S_GROW_E), u(_S_GROW_A)
        d_fuel_e, d_fuel_a = u(_S_FUEL_E), u(_S_FUEL_A)
        jx_raw, jy_raw = nrm(_S_JX), nrm(_S_JY)
    d_light = u(_S_LIGHT)

    rain = bool(u(_S_RAIN, np.uint32(0)) < np.float32(p.rain_chance))
    if rain:
        moisture = np.clip(moisture + np.float32(p.rain_strength),
                           np.float32(0), np.float32(1))

    baseline = np.clip(np.float32(0.45) - np.float32(qc["c020"]) * elev,
                       np.float32(0.05), np.float32(0.7))
    moisture = moisture + np.float32(qc["relax"]) * q12(baseline - moisture)
    moisture = np.clip(moisture, np.float32(0), np.float32(1))

    burning = state == FIRE
    fuel = np.where(burning,
                    np.clip(fuel - np.float32(p.fuel_burn_rate),
                            np.float32(0), np.float32(1)),
                    fuel)
    state = np.where(burning & (fuel <= np.float32(p.burnout_fuel)),
                     ASH, state).astype(np.int32)

    fire = state == FIRE
    fire_n = _roll_or8(fire)
    trees = state == TREE

    gy, gx = np.gradient(elev)
    gy = gy.astype(np.float32)
    gx = gx.astype(np.float32)
    dot = q12(gx) * wx + q12(gy) * wy
    uphill = np.clip(-dot, np.float32(0), np.float32(1))
    slope_boost = np.float32(1.0) + np.float32(qc["slope"]) * q12(uphill)
    wind_clip = np.clip(dot + np.float32(0.5), np.float32(0), np.float32(1))
    wind_boost = np.float32(1.0) + q12(np.float32(qc["wind"]) * wind_clip) \
        * np.float32(qc["c06"])

    fuel_term = np.clip(fuel, np.float32(0), np.float32(1))
    moist_term = np.float32(1.0) - np.clip(moisture, np.float32(0),
                                           np.float32(1))
    spread_p = (np.float32(p.base_spread) * moist_term
                * (np.float32(0.35) + np.float32(qc["c065"]) * q12(fuel_term))
                * slope_boost * wind_boost)
    spread_p = np.clip(spread_p, np.float32(0), np.float32(0.99))

    will_spread = trees & fire_n & (u(_S_SPREAD) < spread_p)
    lightning = trees & (u(_S_LIGHT)
                         < np.float32(p.lightning_rate) * moist_term)
    ignitions = will_spread | lightning

    # destination-draw ember ignition (mirrors models/forestfire.py: the
    # landing cell evaluates p from its own fields with its own rng draw)
    emit = fire & (u(_S_EMIT) < np.float32(p.ember_rate))
    d = (np.float32(3.0)
         + np.floor(u(_S_DIST) * np.float32(p.ember_max_dist + 1 - 3)))
    sig = np.float32(qc["sig"])
    jx = q12(nrm(_S_JX)) * sig
    jy = q12(nrm(_S_JY)) * sig
    dx = (wx * d + jx).astype(np.int32)
    dy = (wy * d + jy).astype(np.int32)
    yi = np.arange(H, dtype=np.int32)[:, None]
    xi = np.arange(W, dtype=np.int32)[None, :]
    yy = np.mod(yi + dy, H)
    xx = np.mod(xi + dx, W)
    lin = yy * W + xx
    # emitter compaction mirror: the device keeps the EMBER_CAP largest
    # emitter linear indices (lax.top_k over where(emit, iota, -1))
    emit_idx = np.nonzero(emit.reshape(-1))[0]
    cap = min(EMBER_CAP, H * W)
    sel = emit_idx[-cap:] if len(emit_idx) > cap else emit_idx
    arrivals = np.zeros(H * W, np.int32)
    np.add.at(arrivals, lin.reshape(-1)[sel], 1)
    arrived = (arrivals > 0).reshape(H, W)
    p_ember = np.clip(
        np.float32(p.spotting_strength) * (np.float32(1.0) - moisture)
        * (np.float32(0.25) + np.float32(qc["c075"]) * q12(fuel)),
        np.float32(0), np.float32(0.95))
    ember_ignitions = arrived & trees & (u(_S_IGNITE) < p_ember)

    ignitions = ignitions | ember_ignitions
    n_ignitions = int(ignitions.sum())
    n_embers = int(emit.sum())
    state = np.where(ignitions, FIRE, state).astype(np.int32)

    empty = state == EMPTY
    ash = state == ASH
    grow_mod = np.clip(np.float32(0.6) + np.float32(qc["c08"]) * q12(moisture),
                       np.float32(0), np.float32(1.6))
    regrow_empty = empty & (u(_S_GROW_E)
                            < np.float32(p.regrow_rate) * grow_mod)
    regrow_ash = ash & (u(_S_GROW_A)
                        < np.float32(p.ash_regrow_rate) * grow_mod)

    fuel_new_e = np.float32(0.5) + np.float32(qc["c03"]) * q12(u(_S_FUEL_E))
    fuel_new_a = np.float32(0.55) \
        + np.float32(qc["c035n"]) * q12(u(_S_FUEL_A))
    state = np.where(regrow_empty | regrow_ash, TREE, state).astype(np.int32)
    fuel = np.where(regrow_empty, fuel_new_e, fuel)
    fuel = np.where(regrow_ash, fuel_new_a, fuel)
    age = np.where(regrow_empty | regrow_ash, 0, age).astype(np.int32)

    trees2 = state == TREE
    age = np.where(trees2, np.clip(age + 1, 0, 65535), age).astype(np.int32)
    fuel = np.where(trees2,
                    np.clip(fuel + (np.float32(0.003)
                                    + np.float32(qc["c0005"])
                                    * q12(moisture)),
                            np.float32(0), np.float32(1)),
                    fuel).astype(np.float32)

    carry = {"state": state, "fuel": fuel.astype(np.float32),
             "moisture": moisture.astype(np.float32), "elev": elev,
             "age": age, "t": carry["t"] + 1}
    stats = np.asarray([
        carry["t"],
        int((state == TREE).sum()), int((state == FIRE).sum()),
        int((state == ASH).sum()), int((state == EMPTY).sum()),
        n_ignitions, n_embers, int(rain)], np.int32)
    return carry, stats


def simulate_np(carry: dict, n_steps: int, params, seed: int):
    rows = []
    t0 = int(carry["t"])
    for k in range(n_steps):
        carry, stats = step_np(carry, t0 + k, params, seed)
        rows.append(stats)
    return carry, np.stack(rows) if rows else np.zeros((0, 8), np.int32)
