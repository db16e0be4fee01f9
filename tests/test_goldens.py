"""Golden regression snapshots.

The parity tests compare engines against NumPy oracles that live in this
repo — a paired engine+oracle change could drift semantics silently.  These
tests pin absolute outputs: small fixed-config renders are hashed against
stored fingerprints (decimated sample values, not bit patterns, so results
survive XLA/NumPy version bumps at the 1e-4 level while catching any real
semantic change).

Regenerate intentionally with:
    python tests/test_goldens.py regen
"""
import json
import os
import sys

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "fingerprints.json")
TOL = 1e-4


def _fingerprint(x, k=64):
    x = np.asarray(x, np.float64).ravel()
    idx = np.linspace(0, len(x) - 1, k).astype(int)
    return [round(float(v), 6) for v in x[idx]]


def _render_all():
    from audio_suite_tpu.models import (forestfire as ff, microsound as ms,
                                        patternlab as pl, scrub, tape)

    out = {}

    sr = 8000
    t = np.arange(sr * 2) / sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.25 * np.sin(2 * np.pi * 933 * t)).astype(np.float32)

    p = tape.TapeParams(sample_rate=sr, markers=[6000, 11000],
                        section_speeds=[1.0, 2.0, 0.5],
                        section_reverse=[False, True, False],
                        tape_age=70, inertia_enabled=True, inertia_amount=50)
    out["tape"] = _fingerprint(tape.render_tape(audio, p, 20000))

    cfg = scrub.ScrubConfig(sample_rate=sr, seed=5, head_count=3)
    trace = scrub.scripted_gesture_trace(
        30, sr, drag_events=[(0.5, 5.0, 0.5)], base_speed=0.5,
        jumps=[(2.0, 4000.0)])
    out["scrub"] = _fingerprint(scrub.render_scrub(audio, cfg, trace))

    mp = ms.MicrosoundParams.from_dict(dict(
        base_sr=sr, out_dur_s=0.4, time_unfold=2.0, micro_ms=4.0,
        gen_mode="Noise burst", grains_per_sec=25.0, max_grains=16,
        partial_stretch=1.5, er_taps=32, er_max_ms=15.0, seed=99,
        bp_density="", bp_unfold="", bp_cutoff="", bp_stretch=""))
    stereo, _ = ms.render(mp)
    out["microsound"] = _fingerprint(stereo)

    rc = pl.RenderConfig(sample_rate=22050, seconds=1.0, bpm=140, seed=4)
    events = pl.generate("Glass Cells", rc)
    y, _ = pl.render(events, rc)
    out["patternlab"] = _fingerprint(y)

    model = ff.ForestFireModel(ff.ModelParams(w=64, h=48), seed=9)
    model.ignite_at(30, 20, radius=3)
    stats = model.simulate(50)
    out["forestfire_stats"] = [int(v) for v in np.asarray(stats).sum(axis=0)]
    return out


def test_goldens_match():
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    got = _render_all()
    assert set(got) == set(want)
    for key in want:
        a = np.asarray(got[key], np.float64)
        b = np.asarray(want[key], np.float64)
        assert a.shape == b.shape, key
        dev = float(np.max(np.abs(a - b)))
        assert dev <= TOL, (key, dev)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(_render_all(), f, indent=1)
        print(f"wrote {GOLDEN_PATH}")
