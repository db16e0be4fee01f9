"""Texture family: sparse dust through a tuned comb resonator.

Genre match for the reference's comb-resonator idiom
(comb_dust_resonator.py) — original program: Poisson dust impulses with
1/f-ish amplitudes excite a feedback comb tuned to a grid-position pitch;
the feedback decays along the track so late cells ring shorter.
"""
import numpy as np


def generate(sr, duration, context):
    n = max(1, int(sr * duration))
    ci = int(context.get("cell_index", 0))
    total = max(1, int(context.get("cells_total", 8)))
    rng = np.random.default_rng(41000 + 13 * ci)

    # dust excitation
    rate = 18.0 + 6.0 * ci              # impulses/sec
    k = rng.poisson(rate * duration)
    exc = np.zeros(n, np.float32)
    if k:
        pos = rng.integers(0, n, size=k)
        amp = (0.3 + 0.7 * rng.random(k) ** 2.5) * rng.choice([-1.0, 1.0], k)
        np.add.at(exc, pos, amp.astype(np.float32))

    # feedback comb tuned to a just-intonation ladder over A2
    ratios = [1.0, 9 / 8, 6 / 5, 4 / 3, 3 / 2, 8 / 5, 9 / 5]
    hz = 110.0 * ratios[ci % len(ratios)] * (2 ** (ci // len(ratios)))
    delay = max(2, int(round(sr / hz)))
    fb = 0.97 - 0.25 * (ci / total)
    y = exc.copy()
    for i in range(delay, n):           # host comb loop (short cells)
        y[i] += fb * y[i - delay]
    peak = float(np.max(np.abs(y))) or 1.0
    return (0.6 * y / peak).astype(np.float32)
