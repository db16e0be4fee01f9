"""Advanced-melodic: two voices in contrary glissando, crossing mid-cell.

Voice A rises and voice B falls through a shared pentatonic field, crossing
at the cell midpoint; each voice's instantaneous pitch is a portamento
between snapped scale degrees (contrary-motion idea of the reference's
two_voice_counterflow — grid_audio_app_0.2/examples/
example_generators_melodic_advanced/two_voice_counterflow.py — with
continuous phase-integrated glides instead of stepped notes).
"""
import numpy as np

_PENTA = np.array([0, 2, 5, 7, 9], dtype=np.float32)


def _snap(semis):
    """Snap a continuous semitone offset to the pentatonic lattice."""
    octave = np.floor(semis / 12.0)
    within = semis - 12.0 * octave
    k = np.argmin(np.abs(_PENTA[None, :] - within[:, None]), axis=1)
    return 12.0 * octave + _PENTA[k]


def generate(sr, duration, context=None):
    n = int(sr * duration)
    if n <= 0:
        return np.zeros(0, np.float32)
    ci = int(context.get("cell_index", 0)) if context else 0
    t = np.arange(n, dtype=np.float32) / sr
    u = t / max(1e-9, duration)          # 0..1 through the cell
    span = 19.0 + 2.0 * (ci % 3)         # semitones traversed
    up = _snap(span * (u - 0.5))         # rises through 0 at midpoint
    dn = _snap(-span * (u - 0.5))        # falls through 0 at midpoint
    base = 220.0
    fa = base * 2.0 ** (up / 12.0)
    fb = base * 2.0 ** (dn / 12.0)
    # integrate frequency for continuous phase through the portamento
    pha = 2 * np.pi * np.cumsum(fa) / sr
    phb = 2 * np.pi * np.cumsum(fb) / sr
    env = np.minimum(1.0, 40.0 * u) * np.minimum(1.0, 40.0 * (1.0 - u))
    y = 0.28 * env * (np.sin(pha) + np.sin(phb))
    return np.tanh(y).astype(np.float32)
