"""Restart family: audio + event — a bright pulse that restarts every OTHER
track half a beat later (event protocol per grid_audio_app
README_RESTART_EVENTS: {"restart_tracks": ..., "delay": seconds}).
"""
import numpy as np


def generate(sr, duration):
    n = max(1, int(sr * duration))
    t = np.arange(n) / sr
    y = np.sin(2 * np.pi * 523.25 * t) * np.exp(-t / 0.05)
    return (0.8 * y).astype(np.float32)


def event(context):
    return {"restart_tracks": "all_except_self", "delay": 0.125}
