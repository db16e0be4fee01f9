"""Pattern Lab generator: three clocks with coprime periods slowly phasing.

Contract (audio_suite_tpu/plugins/host.py script host):
``generate(cfg, **kwargs) -> list[NoteEvent]``.
"""
from audio_suite_tpu.events.notes import NoteEvent


def generate(cfg, root=57, periods=(0.375, 0.5, 0.625), **kw):
    events = []
    scale = [0, 3, 5, 7, 10]
    for vi, period in enumerate(periods):
        t = 0.0
        k = 0
        while t < cfg.seconds:
            deg = scale[(k + vi * 2) % len(scale)] + 12 * (vi % 2)
            events.append(NoteEvent(
                t0=t, dur=min(period * 0.8, 0.45),
                midi=float(root + deg), vel=0.5 + 0.12 * vi,
                chan=vi % 6, engine="FM"))
            t += period
            k += 1
    return events
