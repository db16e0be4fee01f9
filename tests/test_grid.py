"""Grid Audio engine vs. NumPy oracle: segmented-cumsum placement parity
against the reference's sequential phase-accumulator loop, restart events,
cross-track RMS modulation, division normalization, plugin cells."""
import numpy as np
import pytest

from audio_suite_tpu.models import grid
from audio_suite_tpu.utils import io as audio_io
from audio_suite_tpu.utils.metrics import max_dev_dbfs
from oracles.grid_ref import mixdown_np, render_track_to_master_np

SR = 8000


def place_both(pat, n_total, start_off=0.0, loop=False, speed=None,
               resets=()):
    resets = set(resets)
    ref = np.zeros(n_total, np.float32)
    render_track_to_master_np(ref, pat, len(pat), start_off, SR, loop,
                              speed, resets)
    idx, valid = grid.placement_indices(n_total, len(pat), start_off, SR,
                                        loop, speed, resets)
    out = np.where(valid, pat[idx], 0.0).astype(np.float32)
    return out, ref


def rand_pat(n, seed=0):
    return np.random.default_rng(seed).uniform(-1, 1, n).astype(np.float32)


def test_placement_plain_loop():
    pat = rand_pat(700)
    out, ref = place_both(pat, 3000, loop=True)
    assert np.array_equal(out, ref)


def test_placement_nonloop_break():
    pat = rand_pat(700)
    out, ref = place_both(pat, 3000, loop=False)
    assert np.array_equal(out, ref)


def test_placement_speed_mod():
    rng = np.random.default_rng(3)
    speed = np.clip(1.0 + 0.8 * rng.standard_normal(3000), 0.25, 4.0) \
        .astype(np.float32)
    pat = rand_pat(700, 1)
    for loop in (True, False):
        out, ref = place_both(pat, 3000, loop=loop, speed=speed)
        assert np.array_equal(out, ref), f"loop={loop}"


def test_placement_resets():
    pat = rand_pat(500, 2)
    rng = np.random.default_rng(5)
    speed = np.clip(1.0 + 0.5 * rng.standard_normal(4000), 0.25, 4.0) \
        .astype(np.float32)
    resets = {640, 1777, 2930}
    for loop in (True, False):
        out, ref = place_both(pat, 4000, loop=loop, speed=speed,
                              resets=resets)
        assert np.array_equal(out, ref), f"loop={loop}"


def test_placement_offsets():
    pat = rand_pat(600, 7)
    rng = np.random.default_rng(11)
    speed = np.clip(1.0 + 0.5 * rng.standard_normal(4000), 0.25, 4.0) \
        .astype(np.float32)
    for off in (-0.05, 0.07, 0.21):
        for loop in (True, False):
            out, ref = place_both(pat, 4000, start_off=off, loop=loop,
                                  speed=speed, resets={1200})
            assert np.array_equal(out, ref), (off, loop)


def _write_sine_cell(path, freq=440.0):
    path.write_text(
        "import numpy as np\n"
        "def generate(sr, duration):\n"
        "    t = np.arange(int(round(sr*duration)))/sr\n"
        f"    return 0.5*np.sin(2*np.pi*{freq}*t).astype(np.float32)\n")


def _write_ctx_cell(path):
    path.write_text(
        "import numpy as np\n"
        "def generate(sr, duration, context):\n"
        "    n = int(round(sr*duration))\n"
        "    k = context['cell_index'] + 1\n"
        "    t = np.arange(n)/sr\n"
        "    return (0.3*np.sin(2*np.pi*110*k*t)).astype(np.float32)\n")


def _write_event_cell(path):
    path.write_text(
        "import numpy as np\n"
        "def generate(sr, duration):\n"
        "    n = int(round(sr*duration))\n"
        "    x = np.zeros(n, np.float32); x[:8] = 0.9\n"
        "    return x\n"
        "def event(context):\n"
        "    if context['cell_index'] == 2:\n"
        "        return {'restart_tracks': 'all_except_self', 'delay': 0.01}\n"
        "    return None\n")


def make_project(tmp_path):
    sine = tmp_path / "sine.py"
    ctx = tmp_path / "ctx.py"
    evt = tmp_path / "evt.py"
    _write_sine_cell(sine)
    _write_ctx_cell(ctx)
    _write_event_cell(evt)

    wav_path = tmp_path / "loop.wav"
    rng = np.random.default_rng(9)
    audio_io.write_wav(str(wav_path),
                       (0.4 * rng.standard_normal(SR // 2)).astype(np.float32),
                       SR)

    t0 = grid.Track(name="beat", mode="duration", duration_seconds=1.0,
                    uniform_n=4, loop_to_master=True)
    t0.ensure_cells(4)
    t0.cells[0] = grid.CellSource("py", str(evt))
    t0.cells[2] = grid.CellSource("py", str(evt))

    t1 = grid.Track(name="tone", mode="duration", duration_seconds=2.0,
                    uniform_n=4, loop_to_master=True, gain_db=-3.0,
                    mod_source_index=0, mod_amount=0.8, mod_smoothing_ms=30.0,
                    sync_points_text="0.5, 1.25")
    t1.ensure_cells(4)
    t1.cells[0] = grid.CellSource("py", str(ctx))
    t1.cells[1] = grid.CellSource("wav", str(wav_path))
    t1.cells[3] = grid.CellSource("py", str(sine))

    t2 = grid.Track(name="late", mode="tempo_bpm", bpm=120, measures=1,
                    start_offset_seconds=0.3, uniform_n=2)
    t2.ensure_cells(2)
    t2.cells[1] = grid.CellSource("py", str(sine))

    return grid.GridProject(tracks=[t0, t1, t2],
                            master=grid.MasterClock("fixed_seconds", 2.5),
                            sample_rate=SR)


def test_mixdown_vs_oracle(tmp_path):
    project = make_project(tmp_path)
    mix = grid.render_mixdown(project)                    # device engine
    n_total = int(round(2.5 * SR))
    assert mix.shape == (n_total,)

    # oracle: same host pattern/env/reset computation, sequential placement
    restarts = grid.collect_restart_events(project, 2.5)
    assert any(restarts), "event cell produced no restarts"
    pats, placements, gains = [], [], []
    placed = []
    for ti, t in enumerate(project.tracks):
        divs = t.build_divisions()
        t.ensure_cells(len(divs))
        pat_dur = float(sum(divs))
        sync = grid.parse_float_list(t.sync_points_text)
        pat = grid.render_track_pattern(project, ti, t, divs, pat_dur, sync)
        speed = None
        if t.mod_source_index >= 0 and t.mod_amount > 0 \
                and t.mod_source_index < ti:
            speed = grid.mod_speed_for_track(placed[t.mod_source_index],
                                             t.mod_smoothing_ms,
                                             t.mod_amount, SR)
        resets = set(int(round(p * SR)) for p in sync if p >= 0.0)
        resets |= restarts[ti]
        y = np.zeros(n_total, np.float32)
        render_track_to_master_np(y, pat, len(pat), t.start_offset_seconds,
                                  SR, t.loop_to_master, speed, resets)
        g = float(np.float32(10.0 ** (t.gain_db / 20.0)))
        placed.append(y * np.float32(g))
        pats.append(pat)
        placements.append(dict(start_offset_seconds=t.start_offset_seconds,
                               sr=SR, loop_to_master=t.loop_to_master,
                               speed=speed, resets=resets))
        gains.append(g)
    ref = mixdown_np(pats, placements, gains, n_total)
    assert max_dev_dbfs(mix, ref) <= -120.0

    # host engine must agree with the device engine bit-for-bit
    mix_h = grid.render_mixdown(project, engine="host")
    assert np.array_equal(mix, mix_h)


def test_device_host_mixdown_bit_equal(tmp_path):
    """Device table kernel == host twin across mod chains (2 deep), sync
    resets, negative/positive offsets, loop and non-loop tracks."""
    cellp = tmp_path / "rndcell.py"
    cellp.write_text(
        "import numpy as np\n"
        "def generate(sr, dur):\n"
        "    n = int(round(sr*dur))\n"
        "    rng = np.random.default_rng(5)\n"
        "    return (0.5*rng.uniform(-1, 1, n)).astype(np.float32)\n")
    t0 = grid.Track(name="a", mode="duration", duration_seconds=0.7,
                    uniform_n=3, loop_to_master=True,
                    sync_points_text="0.31, 1.17")
    t0.ensure_cells(3)
    t0.cells[0] = grid.CellSource("py", str(cellp))
    t0.cells[2] = grid.CellSource("py", str(cellp))
    t1 = grid.Track(name="b", mode="duration", duration_seconds=0.5,
                    uniform_n=2, loop_to_master=True, mod_source_index=0,
                    mod_amount=0.8, mod_smoothing_ms=30.0, gain_db=-3.0)
    t1.ensure_cells(2)
    t1.cells[0] = grid.CellSource("py", str(cellp))
    t2 = grid.Track(name="c", mode="duration", duration_seconds=0.4,
                    uniform_n=2, loop_to_master=False,
                    start_offset_seconds=-0.05, mod_source_index=1,
                    mod_amount=1.5, mod_smoothing_ms=10.0, gain_db=2.0)
    t2.ensure_cells(2)
    t2.cells[1] = grid.CellSource("py", str(cellp))
    t3 = grid.Track(name="d", mode="duration", duration_seconds=0.3,
                    uniform_n=1, loop_to_master=False,
                    start_offset_seconds=0.8)
    t3.ensure_cells(1)
    t3.cells[0] = grid.CellSource("py", str(cellp))
    p = grid.GridProject(tracks=[t0, t1, t2, t3],
                         master=grid.MasterClock("fixed_seconds", 2.1),
                         sample_rate=SR)
    mix_d = grid.render_mixdown(p, engine="device")
    mix_h = grid.render_mixdown(p, engine="host")
    assert np.array_equal(mix_d, mix_h)
    assert float(np.max(np.abs(mix_d))) > 1e-3


def test_division_normalization_property():
    t = grid.Track(mode="duration", duration_seconds=3.0,
                   division_mode="python",
                   python_code="def divisions(total):\n"
                               "    return [1, 2, 3, 4, 5]\n")
    divs = t.build_divisions()
    assert abs(sum(divs) - 3.0) < 1e-9
    assert abs(divs[1] / divs[0] - 2.0) < 1e-9


def test_division_sandbox_blocks_imports():
    t = grid.Track(mode="duration", duration_seconds=1.0,
                   division_mode="python",
                   python_code="import os\n"
                               "def divisions(total):\n"
                               "    return [total]\n")
    with pytest.raises(Exception):
        t.build_divisions()


def test_master_clock_auto():
    t1 = grid.Track(mode="duration", duration_seconds=2.0,
                    start_offset_seconds=0.5)
    t2 = grid.Track(mode="tempo_bpm", bpm=60, beats_per_measure=4, measures=1)
    assert grid.MasterClock("auto").duration([t1, t2]) == pytest.approx(4.0)


def test_export_wav_roundtrip(tmp_path):
    project = make_project(tmp_path)
    out_path = tmp_path / "mix.wav"
    mix = grid.export_wav(project, str(out_path))
    back, sr = audio_io.read_wav(str(out_path))
    assert sr == SR and len(back) == len(mix)


def test_reference_example_scripts_run(tmp_path):
    """A sample of the reference's 40 example generators must run unchanged
    through the plugin host (wire-compat contract)."""
    import glob
    paths = sorted(glob.glob(
        "/root/reference/grid_audio_app_0.2/examples/*.py"))
    if not paths:
        pytest.skip("reference examples not mounted")
    ok = 0
    for path in paths[:12]:
        t = grid.Track(mode="duration", duration_seconds=0.5, uniform_n=2,
                       loop_to_master=False)
        t.ensure_cells(2)
        t.cells[0] = grid.CellSource("py", path)
        project = grid.GridProject(
            tracks=[t], master=grid.MasterClock("fixed_seconds", 0.5),
            sample_rate=SR)
        mix = grid.render_mixdown(project)
        assert np.isfinite(mix).all(), path
        ok += 1
    assert ok >= 10


def test_native_placement_bit_equal_numpy():
    """C++ phase accumulator vs NumPy segmented-cumsum twin."""
    from audio_suite_tpu.utils import native_rt
    if native_rt.get_lib() is None:
        pytest.skip("no native toolchain")
    import os
    os.environ["AST_DISABLE_NATIVE"] = "0"
    rng = np.random.default_rng(3)
    pat_n, n_total = 700, 5000
    speed = np.clip(1.0 + 0.7 * rng.standard_normal(n_total),
                    0.25, 4.0).astype(np.float32)
    for loop in (True, False):
        for off in (-0.05, 0.0, 0.13):
            start_idx = int(round(off * SR))
            pre = 0.0
            if start_idx < 0:
                pre = float(np.sum(speed[:-start_idx].astype(np.float64)))
            nat = native_rt.grid_placement(
                n_total, pat_n, start_idx, loop, speed, {640, 2930}, pre)
            # numpy fallback path (bypass native)
            import audio_suite_tpu.utils.native_rt as nr
            saved = nr._lib, nr._tried
            nr._lib, nr._tried = None, True
            try:
                idx2, valid2 = grid.placement_indices(
                    n_total, pat_n, off, SR, loop, speed, {640, 2930})
            finally:
                nr._lib, nr._tried = saved
            pat = rand_pat(pat_n, 5)
            a = np.where(nat[1], pat[nat[0]], 0.0)
            b = np.where(valid2, pat[idx2], 0.0)
            assert np.array_equal(a, b), (loop, off)


def test_device_host_bit_equal_deep_negative_offset(tmp_path):
    """start_offset more negative than the master length: the pre-roll
    phase must be the FULL -start_idx for unit-speed tracks (round-2
    review finding: the device kernel capped it at n_total)."""
    cellp = tmp_path / "c.py"
    cellp.write_text(
        "import numpy as np\n"
        "def generate(sr, dur):\n"
        "    n = int(round(sr*dur))\n"
        "    return (0.1 + 0.8*np.arange(n)/n).astype(np.float32)\n")
    t0 = grid.Track(name="deep", mode="duration", duration_seconds=0.07,
                    uniform_n=1, loop_to_master=True,
                    start_offset_seconds=-5.0)      # far before a 1s master
    t0.ensure_cells(1)
    t0.cells[0] = grid.CellSource("py", str(cellp))
    p = grid.GridProject(tracks=[t0],
                         master=grid.MasterClock("fixed_seconds", 1.0),
                         sample_rate=8000)
    mix_d = grid.render_mixdown(p, engine="device")
    mix_h = grid.render_mixdown(p, engine="host")
    assert np.array_equal(mix_d, mix_h)
    assert float(np.max(np.abs(mix_d))) > 1e-3
