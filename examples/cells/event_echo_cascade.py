"""Restart-topology family: audio + event in one cell.  Emits a short
sonar ping, and its event() restarts the NEXT track with a delay that
grows with this cell's grid position — a cascade where each occurrence
pushes its neighbor later, audible as staggered re-entries."""
import numpy as np


def generate(sr, dur, context=None):
    n = int(round(sr * dur))
    ci = int((context or {}).get("cell_index", 0))
    L = min(n, int(0.08 * sr) + 16)
    k = np.arange(L)
    f = 900.0 * 2.0 ** ((ci % 5) / 5.0)
    ping = np.sin(2 * np.pi * f * k / sr) * np.exp(-k / (0.018 * sr + 1))
    out = np.zeros(n, np.float32)
    out[:L] = 0.7 * ping
    return out


def event(context):
    ci = int(context.get("cell_index", 0))
    ti = int(context.get("track_index", 0))
    return {"restart_tracks": [ti + 1], "delay": 0.05 * (1 + ci % 4)}
