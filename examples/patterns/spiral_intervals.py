"""Pattern Lab generator: a spiral of pythagorean fifths folded into two
octaves (fractional MIDI), played as a slow three-voice organ canon.
"""
from audio_suite_tpu.events.notes import NoteEvent


def _fold(semis, lo=0.0, hi=24.0):
    span = hi - lo
    while semis >= hi:
        semis -= span
    while semis < lo:
        semis += span
    return semis


def generate(cfg, root=45, voices=3, step_s=0.5, **kw):
    fifth = 7.019550008653875          # 12 * log2(3/2): a PURE fifth
    events = []
    n_steps = int(cfg.seconds / step_s) + 1
    for v in range(int(voices)):
        for k in range(n_steps):
            t0 = k * step_s + v * step_s / 3.0
            if t0 >= cfg.seconds:
                break
            semis = _fold((k + 5 * v) * fifth)
            events.append(NoteEvent(
                t0=t0, dur=step_s * 1.8,
                midi=root + semis + 12 * v, vel=0.45 + 0.1 * v,
                chan=(2 * v) % 6, engine="FM"))
    return events
