"""Melodic family: two-voice modal hocket.

Genre match for the reference's modal-hocket idiom
(grid_audio_app_0.2/examples/example_generators_more_melodic/) — original
program: two timbrally distinct voices alternate degrees of a dorian
hexachord, the split point walking one degree per cell so the hocket
seam migrates across the bar.
"""
import numpy as np

_DORIAN = [0, 2, 3, 5, 7, 9]          # semitones over the root


def _tone(sr, n, hz, bright):
    t = np.arange(n) / sr
    y = np.sin(2 * np.pi * hz * t)
    if bright:
        y = y + 0.4 * np.sin(2 * np.pi * 2.0 * hz * t + 0.3)
        y = y + 0.15 * np.sin(2 * np.pi * 5.0 * hz * t)
    else:
        y = y + 0.3 * np.sin(2 * np.pi * 0.5 * hz * t)
    return y


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    root = 146.83                       # D3
    steps = 8
    step_n = max(1, n // steps)
    split = ci % len(_DORIAN)           # hocket seam walks per cell
    out = np.zeros(n, np.float32)
    for s in range(steps):
        deg = _DORIAN[(s * 5 + ci) % len(_DORIAN)]
        hz = root * (2.0 ** (deg / 12.0))
        voice_a = deg >= _DORIAN[split]
        a = s * step_n
        b = min(n, a + step_n)
        if b <= a:
            break
        seg = _tone(sr, b - a, hz * (2.0 if voice_a else 1.0), voice_a)
        fade = max(1, int(0.004 * sr))
        env = np.ones(b - a)
        env[:fade] = np.linspace(0, 1, min(fade, b - a))
        env[-fade:] *= np.linspace(1, 0, min(fade, b - a))
        out[a:b] += (0.4 * seg * env).astype(np.float32)
    return out.astype(np.float32)
