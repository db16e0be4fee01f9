"""Capability smokes for reference features not covered by the parity
suites: tempo_spm clocks, record->reload loop, STFT analysis, moisture
overlay, stereo scrub output, Pattern Lab preset render, undo stack."""
import json

import numpy as np

from audio_suite_tpu.utils import io as audio_io


def test_grid_tempo_spm_clock():
    from audio_suite_tpu.models import grid
    t = grid.Track(mode="tempo_spm", seconds_per_measure=1.5, measures=3)
    assert t.total_duration() == 4.5
    divs = t.build_divisions()
    assert abs(sum(divs) - 4.5) < 1e-9


def test_tape_record_reload_loop(tmp_path):
    """The reference's record -> reload-as-new-source loop
    (Tape…py:347-386): render to WAV, load it back, render again."""
    from audio_suite_tpu.models import tape
    sr = 8000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    src = str(tmp_path / "src.wav")
    audio_io.write_wav(src, x, sr)
    p1 = tape.TapeParams(sample_rate=sr, markers=[4000],
                         section_speeds=[1.0, 2.0],
                         section_reverse=[False, True])
    mid = str(tmp_path / "mid.wav")
    out1 = tape.render_to_wav(src, mid, p1)
    p2 = tape.TapeParams(sample_rate=sr, markers=[],
                         section_speeds=[0.5], section_reverse=[False])
    out2 = tape.render_to_wav(mid, str(tmp_path / "out.wav"), p2)
    assert len(out2) > len(out1)
    assert np.isfinite(out2).all()

    # undo stack (Tape…py:707-759)
    undo = tape.UndoStack(depth=3)
    for age in (10, 20, 30, 40):
        p1.tape_age = age
        undo.push(p1)
    assert len(undo) == 3
    restored = undo.pop()
    assert restored.tape_age == 40


def test_stft_display():
    """Analysis-view computation (main_v2.py:197-212)."""
    import jax.numpy as jnp
    from audio_suite_tpu.ops.spectral import stft_mag_db
    sr = 8000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    S = np.asarray(stft_mag_db(jnp.asarray(x), sr, win=512, hop=128))
    assert S.shape[0] == 257 and S.shape[1] > 10
    peak_bin = int(np.argmax(S.mean(axis=1)))
    assert abs(peak_bin * sr / 512 - 440) < sr / 512  # energy at 440 Hz
    # short-input branch
    S2 = np.asarray(stft_mag_db(jnp.asarray(x[:100]), sr, win=512))
    assert S2.shape == (257, 1)


def test_forestfire_moisture_overlay_and_reset():
    from audio_suite_tpu.models import forestfire as ff
    params = ff.ModelParams(w=32, h=24, show_moisture_overlay=True)
    m = ff.ForestFireModel(params, seed=1)
    rgb1 = m.render_rgb()
    assert rgb1.shape == (24, 32, 3)
    m.simulate(5)
    m.reset()
    assert int(m._np["t"]) == 0
    m2 = ff.ForestFireModel(params, seed=1)
    assert np.array_equal(m._np["state"], m2._np["state"])  # reset == fresh


def test_scrub_stereo_output():
    from audio_suite_tpu.models import scrub
    sr = 8000
    x = np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)
    cfg = scrub.ScrubConfig(sample_rate=sr, head_count=1)
    trace = scrub.constant_trace(8, base_speed=1.0)
    y = scrub.render_scrub(x, cfg, trace, stereo=True)
    assert y.ndim == 2 and y.shape[1] == 2
    assert np.array_equal(y[:, 0], y[:, 1])  # scrubber_0.7.py:233-234


def test_patternlab_preset_roundtrip(tmp_path):
    from audio_suite_tpu.models import patternlab as pl
    preset = {"name": "demo", "generator": "Glass Cells",
              "cfg": {"sample_rate": 22050, "seconds": 1.0, "bpm": 150,
                      "seed": 2},
              "gen": {"root_midi": 62, "scale": "dorian", "voices": 2}}
    path = str(tmp_path / "p.json")
    pl.save_preset(path, preset)
    loaded = pl.load_preset(path)
    assert loaded == preset
    y, events = pl.render_preset(loaded)
    assert len(events) > 0 and np.isfinite(y).all()
    assert len(y) == 22050


def test_microsound_preset_save_load_roundtrip(tmp_path):
    from audio_suite_tpu.models import microsound as ms
    p = ms.MicrosoundParams.from_dict({"gen_mode": "Wavelet atoms",
                                       "seed": 77, "time_unfold": 13.0})
    path = str(tmp_path / "m.json")
    ms.save_preset(p, path)
    with open(path) as f:
        d = json.load(f)
    assert len(d) >= 80            # full get_params key set
    assert ms.load_preset(path).to_dict() == p.to_dict()


def test_device_trace_capture(tmp_path):
    """SURVEY §5 tracing: device_trace wraps a jitted render in a
    jax.profiler capture and writes TensorBoard/Perfetto artifacts."""
    import glob

    import jax.numpy as jnp
    import jax

    from audio_suite_tpu.utils.profiling import annotate, device_trace

    tdir = tmp_path / "trace"
    with device_trace(str(tdir)):
        with annotate("tiny-render"):
            y = jax.jit(lambda x: jnp.tanh(x) * 0.5)(jnp.ones(4096))
            y.block_until_ready()
    found = glob.glob(str(tdir / "**" / "*.xplane.pb"), recursive=True) \
        + glob.glob(str(tdir / "**" / "*.trace.json.gz"), recursive=True)
    assert found, f"no profiler artifacts under {tdir}"
    # no-op path
    with device_trace(None):
        pass
