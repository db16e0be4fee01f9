"""Restart-count-inference EVENT cell (topology/restart family).

Audio: a short filtered-noise "handshake" tick.  Event: restarts the
PREVIOUS track, with a delay scaled by this cell's inferred restart index —
so the topology tightens as sync points accumulate.  The inference projects
track_sync_points_master into pattern time, the protocol demonstrated by the
reference family (grid_audio_app_0.2/examples/
example_generators_rhythmic_topology_restart/restart_mutating_euclid.py:16-56;
event protocol per examples/README_RESTART_EVENTS.txt:3-17).
"""
import numpy as np


def _restart_index(context):
    syncs = (context or {}).get("track_sync_points_master", []) or []
    pat_dur = float((context or {}).get("track_pattern_duration", 0.0) or 0.0)
    if not syncs or pat_dur <= 1e-9:
        return 0
    off = float(context.get("track_offset", 0.0))
    c0 = float(context.get("cell_start", 0.0))
    return sum(1 for sp in syncs if ((float(sp) - off) % pat_dur) <= c0)


def generate(sr, duration, context=None):
    n = int(sr * duration)
    if n <= 0:
        return np.zeros(0, np.float32)
    rix = _restart_index(context)
    rng = np.random.default_rng(60801 + 37 * rix)
    tick = rng.standard_normal(min(n, max(8, int(0.012 * sr))))
    # one-pole lowpass darkens with each inferred restart
    a = 0.2 + 0.15 * min(rix, 4)
    for i in range(1, len(tick)):
        tick[i] = a * tick[i - 1] + (1.0 - a) * tick[i]
    y = np.zeros(n, np.float32)
    y[: len(tick)] = 0.8 * tick / max(1e-9, np.max(np.abs(tick)))
    return y.astype(np.float32)


def event(context):
    ti = int(context.get("track_index", 0))
    if ti == 0:
        return {}
    rix = _restart_index(context)
    delay = min(0.25 * rix, 1.0)
    return {"restart_tracks": [ti - 1], "delay": float(delay)}
