"""Restart-count-inference generator (topology/restart family).

Infers its own "restart index" by projecting the track's master-timeline
sync points into pattern time — the technique pioneered by the reference's
restart_mutating_euclid (grid_audio_app_0.2/examples/
example_generators_rhythmic_topology_restart/restart_mutating_euclid.py:16-56)
— then uses that index to permute an inharmonic bell lattice: strike order,
partial detune, and damping all mutate each time the track is reset.
Original composition; only the context-key protocol is shared.
"""
import numpy as np


def _restart_index(context):
    """Count sync points that project into (or before) this cell when the
    pattern is wrapped onto the master timeline."""
    if not context:
        return 0
    syncs = context.get("track_sync_points_master", []) or []
    pat_dur = float(context.get("track_pattern_duration", 0.0) or 0.0)
    if not syncs or pat_dur <= 1e-9:
        return 0
    off = float(context.get("track_offset", 0.0))
    c0 = float(context.get("cell_start", 0.0))
    c1 = c0 + float(context.get("cell_duration", 0.0))
    inside = before = 0
    for sp in syncs:
        rel = (float(sp) - off) % pat_dur
        if c0 <= rel < c1:
            inside += 1
        elif rel < c0:
            before += 1
    return inside if inside else before


def generate(sr, duration, context=None):
    n = int(sr * duration)
    if n <= 0:
        return np.zeros(0, np.float32)
    ci = int(context.get("cell_index", 0)) if context else 0
    rix = _restart_index(context)
    rng = np.random.default_rng(40111 + ci * 131 + rix * 769)

    strikes = 5
    # restart index permutes WHICH subdivision each strike lands on
    order = np.argsort((np.arange(strikes) * (2 + rix)) % strikes)
    t = np.arange(n, dtype=np.float32) / sr
    y = np.zeros(n, np.float32)
    f0 = 180.0 * (1.0 + 0.06 * (rix % 4))
    for s in range(strikes):
        pos = int(order[s] * n / strikes)
        seg = t[: n - pos]
        damp = 9.0 + 3.0 * ((rix + s) % 3)
        tone = np.zeros_like(seg)
        for k, ratio in enumerate((1.0, 2.76, 5.40, 8.93)):
            det = 1.0 + 0.002 * rng.standard_normal()
            tone += (0.5 / (k + 1)) * np.sin(
                2 * np.pi * f0 * ratio * det * seg)
        y[pos:] += tone * np.exp(-seg * damp) * (0.9 - 0.12 * s)
    return np.tanh(1.2 * y).astype(np.float32)
