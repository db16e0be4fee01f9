"""Randomized robustness sweep: every engine must render ANY in-range
config without exceptions, NaNs, or shape surprises.  Parity tests pin
correctness on fixed configs; this sweep guards the long tail of
parameter combinations (the kind of input a preset file or script cell
can produce).  Seeded, so failures reproduce."""
import numpy as np
import pytest

from audio_suite_tpu.models import (forestfire as ff, grid,
                                    microsound as ms, patternlab as pl,
                                    scrub, tape)


def _finite(x):
    x = np.asarray(x)
    return bool(np.all(np.isfinite(x)))


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6, 7, 8])
def test_microsound_fuzz(seed):
    rng = np.random.default_rng(seed)
    mode = ms.GEN_MODES[int(rng.integers(0, len(ms.GEN_MODES)))]
    p = ms.MicrosoundParams.from_dict(dict(
        gen_mode=mode,
        base_sr=int(rng.choice([8000, 16000, 44100])),
        out_dur_s=float(rng.uniform(0.05, 0.6)),
        time_unfold=float(rng.uniform(1.0, 30.0)),
        micro_ms=float(rng.uniform(0.2, 8.0)),
        grains_per_sec=float(rng.uniform(0.0, 60.0)),
        max_grains=int(rng.integers(1, 48)),
        partial_stretch=float(rng.uniform(0.25, 4.0)),
        partial_lock_on=bool(rng.integers(0, 2)),
        nl_warp_on=bool(rng.integers(0, 2)),
        cep_warp_on=bool(rng.integers(0, 2)),
        nl_warp_power=float(rng.uniform(0.5, 2.5)),
        cep_factor=float(rng.uniform(0.5, 2.0)),
        bandlimit_on=bool(rng.integers(0, 2)),
        res_bank_on=bool(rng.integers(0, 2)),
        wg_on=bool(rng.integers(0, 2)),
        event_feedback_on=bool(rng.integers(0, 2)),
        spectral_imprint_on=bool(rng.integers(0, 2)),
        er_cloud_on=bool(rng.integers(0, 2)), er_taps=32, er_max_ms=10.0,
        stereo_on=bool(rng.integers(0, 2)),
        grain_offset_on=bool(rng.integers(0, 2)),
        event_process=str(rng.choice(
            ["Poisson", "Single", "Clustered", "Hawkes"])),
        unfold_mode=str(rng.choice(
            ["Classic reinterpret", "Multiband"])),
        seed=int(rng.integers(0, 99999))))
    out, meta = ms.render(p)
    assert out.shape[0] == int(max(1, round(p.out_dur_s * p.base_sr)))
    assert out.shape[1] == 2
    assert _finite(out)
    assert float(np.max(np.abs(out))) <= 1.0 + 1e-5


@pytest.mark.parametrize("seed", [11, 12, 13, 14])
def test_tape_fuzz(seed):
    rng = np.random.default_rng(seed)
    sr = 8000
    n = int(rng.integers(2000, 30000))
    audio = (rng.standard_normal(n) * 0.4).astype(np.float32)
    n_marks = int(rng.integers(0, 5))
    markers = sorted(int(v) for v in rng.integers(1, max(2, n - 1),
                                                  n_marks))
    k = len(markers) + 1
    p = tape.TapeParams(
        sample_rate=sr, markers=markers,
        section_speeds=[float(rng.uniform(-4.0, 4.0)) or 1.0
                        for _ in range(k)],
        section_reverse=[bool(rng.integers(0, 2)) for _ in range(k)],
        tape_age=int(rng.integers(0, 101)),
        inertia_enabled=bool(rng.integers(0, 2)),
        inertia_amount=int(rng.integers(0, 101)),
        enable_splice_fx=bool(rng.integers(0, 2)),
        anticlick_enabled=bool(rng.integers(0, 2)))
    frames = int(rng.integers(500, 20000))
    y = tape.render_tape(audio, p, frames)
    assert y.shape[0] == frames
    assert _finite(y)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_scrub_fuzz(seed):
    rng = np.random.default_rng(seed)
    sr = 8000
    audio = (rng.standard_normal(int(rng.integers(3000, 20000)))
             * 0.4).astype(np.float32)
    cfg = scrub.ScrubConfig(sample_rate=sr, seed=seed,
                            head_count=int(rng.integers(1, 4)))
    blocks = int(rng.integers(5, 60))
    trace = scrub.scripted_gesture_trace(
        blocks, sr,
        drag_events=[(float(rng.uniform(0, 0.5)),
                      float(rng.uniform(-6, 6)),
                      float(rng.uniform(0.05, 0.5)))],
        base_speed=float(rng.uniform(-2, 2)),
        jumps=[(float(rng.uniform(0, 0.5)),
                float(rng.uniform(0, len(audio))))])
    y = scrub.render_scrub(audio, cfg, trace)
    assert y.shape[0] == blocks * scrub.BLOCK_SIZE
    assert _finite(y)


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_patternlab_fuzz(seed):
    rng = np.random.default_rng(seed)
    rc = pl.RenderConfig(sample_rate=22050,
                         seconds=float(rng.uniform(0.3, 1.5)),
                         bpm=int(rng.integers(60, 200)), seed=seed)
    gen = str(rng.choice([g for g in pl.list_generators()
                          if g != "Python Script"]))
    events = pl.generate(gen, rc)
    y, _ = pl.render(events, rc)
    assert _finite(y)
    assert float(np.max(np.abs(y))) <= 1.0 + 1e-5


@pytest.mark.parametrize("seed", [41, 42])
def test_forestfire_fuzz(seed):
    rng = np.random.default_rng(seed)
    model = ff.ForestFireModel(
        ff.ModelParams(w=int(rng.integers(8, 64)),
                       h=int(rng.integers(8, 48))), seed=seed)
    model.ignite_at(int(rng.integers(0, 8)), int(rng.integers(0, 8)),
                    radius=int(rng.integers(1, 4)))
    stats = model.simulate(int(rng.integers(5, 40)))
    assert _finite(stats)


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_forestfire_sharded_fuzz(seed):
    """Random grid shapes/params: the row-sharded CA must stay bit-equal
    to the dense engine (not just finite) for any divisible grid."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    from audio_suite_tpu.parallel import batch as pb, ca

    rng = np.random.default_rng(seed)
    D = int(rng.choice([2, 4]))
    mesh = pb.make_mesh(D, axis_names=("sp",))
    params = ff.ModelParams(
        h=D * int(rng.integers(4, 16)),
        w=int(rng.integers(8, 64)),
        ember_rate=float(rng.uniform(0.0, 0.4)),
        wind_dir_deg=float(rng.uniform(0.0, 360.0)),
        rain_chance=float(rng.uniform(0.0, 0.2)))
    model = ff.ForestFireModel(params, seed=seed)
    model.ignite_at(int(rng.integers(0, params.w)),
                    int(rng.integers(0, params.h)),
                    radius=int(rng.integers(1, 4)))
    carry0 = {k: np.array(v) for k, v in model._np.items()}
    n = int(rng.integers(5, 25))

    carry_sh, stats_sh = ca.simulate_sharded(params, carry0, n, mesh,
                                             seed=seed)
    stats_dense = model.simulate(n)
    assert np.array_equal(np.asarray(stats_dense, np.int64),
                          np.asarray(stats_sh, np.int64))
    for k in ("state", "fuel", "moisture", "age"):
        assert np.array_equal(model._np[k], np.asarray(carry_sh[k])), k
