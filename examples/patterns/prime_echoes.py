"""Pattern Lab generator: a sparse motif whose echoes land at prime-numbered
sixteenth offsets, so repeats never line up the same way twice.
"""
from audio_suite_tpu.events.notes import NoteEvent

_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23]


def generate(cfg, root=62, echoes=4, **kw):
    step = 60.0 / cfg.bpm / 4.0
    events = []
    motif = [(0, 0.9), (4, 0.7), (7, 0.8), (12, 0.6)]
    bar = step * 16
    t = 0.0
    bar_i = 0
    while t < cfg.seconds:
        for di, (deg, vel) in enumerate(motif):
            t0 = t + di * 2 * step
            if t0 >= cfg.seconds:
                break
            events.append(NoteEvent(t0=t0, dur=step * 1.5,
                                    midi=float(root + deg), vel=vel,
                                    chan=0, engine="FM"))
            for e in range(1, int(echoes) + 1):
                p = _PRIMES[(bar_i + di + e) % len(_PRIMES)]
                te = t0 + p * step
                if te < cfg.seconds:
                    events.append(NoteEvent(
                        t0=te, dur=step, midi=float(root + deg),
                        vel=vel * (0.55 ** e), chan=e % 4, engine="PSG"))
        t += bar
        bar_i += 1
    return events
