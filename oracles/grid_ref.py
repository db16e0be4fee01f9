"""NumPy oracle for the Grid Audio engine.

A direct sequential port of the reference's per-master-sample phase
accumulator (grid_audio_app_0.2/grid_audio_app.py:786-814) and mixdown sum
(:708-756), used to validate the engine's parallel segmented-cumsum
placement and device mix kernel."""
from __future__ import annotations

from typing import List, Optional

import numpy as np


def render_track_to_master_np(out: np.ndarray, pat: np.ndarray, pat_n: int,
                              start_offset_seconds: float, sr: int,
                              loop_to_master: bool,
                              speed: Optional[np.ndarray],
                              reset_samples: set):
    """Verbatim loop semantics of the reference (:786-814)."""
    n_total = len(out)
    start_idx = int(round(start_offset_seconds * sr))
    phase = 0.0
    if start_idx < 0:
        pre = -start_idx
        if speed is None:
            phase = float(pre)
        else:
            phase = float(np.sum(speed[: min(pre, len(speed))]))
    for i in range(n_total):
        if i in reset_samples:
            phase = 0.0
        local = i - start_idx
        if local < 0:
            continue
        if not loop_to_master and local >= pat_n:
            break
        inc = 1.0
        if speed is not None and i < len(speed):
            inc = float(speed[i])
        idx = int(phase) % pat_n if loop_to_master else int(phase)
        if 0 <= idx < pat_n:
            out[i] += float(pat[idx])
        phase += inc
        if not loop_to_master and phase >= pat_n:
            break


def mixdown_np(patterns: List[np.ndarray], placements: List[dict],
               gains: List[float], n_total: int) -> np.ndarray:
    """Reference mixdown sum + clip (:745-756) over prebuilt patterns.
    placements[i]: {start_offset_seconds, sr, loop_to_master, speed, resets}.
    """
    mix = np.zeros(n_total, np.float32)
    for pat, pl, g in zip(patterns, placements, gains):
        y = np.zeros(n_total, np.float32)
        render_track_to_master_np(y, pat, len(pat),
                                  pl["start_offset_seconds"], pl["sr"],
                                  pl["loop_to_master"], pl.get("speed"),
                                  pl.get("resets", set()))
        mix += y.astype(np.float32) * np.float32(g)
    return np.clip(mix, -1.0, 1.0).astype(np.float32)
