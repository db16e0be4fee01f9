"""Generate the framework's synthetic IR bank (mono 48 kHz PCM_16 WAVs,
<= 8192 samples, mirroring the reference bank's format:
microsound_0.2.1/irs/*.wav).  Deterministic; run from the repo root:

    python examples/irs/make_irs.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from audio_suite_tpu.utils import wavcodec  # noqa: E402

SR = 48000
OUT = os.path.dirname(os.path.abspath(__file__))


def _norm(x):
    x = np.asarray(x, np.float32)
    peak = float(np.max(np.abs(x))) or 1.0
    return (0.9 * x / peak).astype(np.float32)


def ir_plate(n=8192, seed=11):
    """Dense exponential noise tail — a small plate."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = rng.standard_normal(n) * np.exp(-t / 0.028)
    x[0] = 1.0
    return _norm(x)


def ir_comb_chamber(n=6144, seed=23):
    """Comb-resonant chamber: sparse repeating slap with decay."""
    rng = np.random.default_rng(seed)
    x = np.zeros(n, np.float32)
    period = int(0.0047 * SR)
    g = 1.0
    for k in range(0, n, period):
        x[k] = g * (1.0 if k == 0 else rng.uniform(0.7, 1.0))
        g *= 0.74
    t = np.arange(n) / SR
    x = x + 0.08 * rng.standard_normal(n) * np.exp(-t / 0.01)
    return _norm(x)


def ir_glint(n=4096, seed=37):
    """Bright sparse early reflections, high-passed feel."""
    rng = np.random.default_rng(seed)
    x = np.zeros(n, np.float32)
    x[0] = 1.0
    for _ in range(24):
        p = int(rng.integers(32, n))
        x[p] += rng.uniform(-0.5, 0.5) * np.exp(-p / (0.012 * SR))
    # difference = crude high-pass shimmer
    x[1:] = x[1:] - 0.6 * x[:-1]
    return _norm(x)


BANK = {
    "plate_small.wav": ir_plate,
    "comb_chamber.wav": ir_comb_chamber,
    "glint_early.wav": ir_glint,
}


def main():
    for name, fn in BANK.items():
        path = os.path.join(OUT, name)
        wavcodec.write_wav(path, fn(), SR, subtype="PCM_16")
        print("wrote", path)


if __name__ == "__main__":
    main()
