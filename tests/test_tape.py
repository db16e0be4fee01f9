"""TapeTUC engine vs. NumPy oracle (SURVEY.md §4 test plan: kernel parity
with fixed seeds, <= -60 dBFS max deviation; property test for the
duration-preserving retime)."""
import numpy as np
import pytest

from audio_suite_tpu.models import tape
from audio_suite_tpu.utils.metrics import max_dev_dbfs
from oracles.tape_ref import render_tape_np


def make_test_audio(sr=48000, seconds=1.5, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.3 * np.sin(2 * np.pi * 933 * t + 0.5)
         + 0.1 * rng.standard_normal(t.size))
    return (x / np.max(np.abs(x))).astype(np.float32)


def run_both(params, audio, num_frames):
    prog = tape.build_tape_program(audio, params, num_frames)
    ref = render_tape_np(prog)
    out = tape.render_tape(audio, params, num_frames)
    return out, ref


@pytest.fixture(scope="module")
def audio():
    return make_test_audio()


def test_plain_playback_parity(audio):
    params = tape.TapeParams(markers=[], section_speeds=[1.0],
                             section_reverse=[False])
    out, ref = run_both(params, audio, 24000)
    assert max_dev_dbfs(out, ref) <= -60.0


def test_varispeed_sections_parity(audio):
    n = len(audio)
    markers = [n // 5, 2 * n // 5, 3 * n // 5, 4 * n // 5]
    params = tape.TapeParams(
        markers=markers,
        section_speeds=[0.25, 4.0, 1.7, 0.5, 2.3],
        section_reverse=[False, True, False, True, False],
        tape_age=80,
    )
    out, ref = run_both(params, audio, 48000)
    assert max_dev_dbfs(out, ref) <= -60.0


def test_inertia_parity(audio):
    n = len(audio)
    params = tape.TapeParams(
        markers=[n // 3, 2 * n // 3],
        section_speeds=[0.5, 3.0, 1.0],
        section_reverse=[False, False, True],
        inertia_enabled=True,
        inertia_amount=70,
        tape_age=100,
    )
    out, ref = run_both(params, audio, 36000)
    assert max_dev_dbfs(out, ref) <= -60.0


def test_splice_and_anticlick_active(audio):
    """The boundary FX paths must actually fire in the parity configs."""
    n = len(audio)
    markers = [n // 4, n // 2, 3 * n // 4]
    params = tape.TapeParams(markers=markers,
                             section_speeds=[1.0, 1.0, 1.0, 1.0],
                             section_reverse=[False] * 4)
    out, ref = run_both(params, audio, 48000)
    assert max_dev_dbfs(out, ref) <= -60.0
    # anticlick + splice change the output vs. a render with them disabled
    params_off = tape.TapeParams(markers=markers,
                                 section_speeds=[1.0, 1.0, 1.0, 1.0],
                                 section_reverse=[False] * 4,
                                 enable_splice_fx=False,
                                 anticlick_enabled=False)
    out_off = tape.render_tape(audio, params_off, 48000)
    assert np.max(np.abs(out - out_off)) > 1e-3


def test_fit_to_target_time_property(audio):
    """Retimed speeds reproduce the target duration when unclamped
    (Tape…py:687-703): sum len_i/(v_i' sr) == target."""
    n = len(audio)
    params = tape.TapeParams(markers=[n // 3, 2 * n // 3],
                             section_speeds=[1.0, 2.0, 0.8],
                             section_reverse=[False] * 3)
    target = 2.0
    new_speeds = tape.fit_to_target_time(params, n, target)
    starts, ends = tape.sections_from_markers(params.markers, n)
    total = sum((int(e) - int(s)) / (v * params.sample_rate)
                for s, e, v in zip(starts, ends, new_speeds))
    assert abs(total - target) < 1e-3
    # ratios preserved
    r0 = params.section_speeds[1] / params.section_speeds[0]
    r1 = new_speeds[1] / new_speeds[0]
    assert abs(r0 - r1) < 1e-6


def test_fit_to_target_time_clamps(audio):
    n = len(audio)
    params = tape.TapeParams(markers=[], section_speeds=[1.0],
                             section_reverse=[False])
    speeds = tape.fit_to_target_time(params, n, 0.001)  # absurdly short
    assert all(0.25 <= v <= 4.0 for v in speeds)


def test_detect_beats_finds_clicks():
    sr = 48000
    x = np.zeros(sr * 2, np.float32)
    for k in range(1, 8):
        p = int(k * 0.25 * sr)
        x[p:p + 32] = 1.0  # sharp energy onsets every 0.25 s
    beats = tape.detect_beats(x, sr, sensitivity=50)
    assert len(beats) >= 4
    # detected markers land near the click positions (within a few hops —
    # the 3-tap smoothing + positive-difference shift the peak slightly)
    for b in beats:
        assert min(abs(b - int(k * 0.25 * sr)) for k in range(1, 8)) <= 2048


def test_undo_stack_roundtrip():
    p = tape.TapeParams(markers=[100], section_speeds=[1.0, 2.0],
                        section_reverse=[False, True])
    undo = tape.UndoStack(depth=3)
    undo.push(p)
    p2 = tape.TapeParams(markers=[100, 200], section_speeds=[1.0, 2.0, 0.5],
                         section_reverse=[False, True, False])
    undo.push(p2)
    restored = undo.pop()
    assert restored.markers == [100, 200]
    restored = undo.pop()
    assert restored.markers == [100]
    assert undo.pop() is None


def test_section_render_length(audio):
    n = len(audio)
    params = tape.TapeParams(markers=[n // 2], section_speeds=[2.0, 0.5],
                             section_reverse=[False, False])
    # half at 2x (n/4 out) + half at 0.5x (n out) = 1.25 n
    assert abs(tape.section_render_length(params, n) - 1.25 * n) < 2


# ---------------------------------------------------------------------------
# segment engine (parallel trajectory + gather) vs the sequential scan
# ---------------------------------------------------------------------------

def _seg_vs_scan(audio, params, frames):
    a = tape.render_tape(audio, params, frames, engine="scan")
    b = tape.render_tape(audio, params, frames, engine="segment")
    return max_dev_dbfs(a, b)


def test_segment_engine_matches_scan_plain(audio):
    p = tape.TapeParams(markers=[], section_speeds=[1.0],
                        section_reverse=[False])
    assert _seg_vs_scan(audio, p, 24000) <= -120.0


def test_segment_engine_matches_scan_full(audio):
    n = len(audio)
    p = tape.TapeParams(
        markers=[n // 5, n // 2, (3 * n) // 4],
        section_speeds=[1.0, 2.7, 0.31, 3.9],
        section_reverse=[False, True, False, True],
        tape_age=85, enable_splice_fx=True, anticlick_enabled=True,
        anticlick_amount=70)
    assert _seg_vs_scan(audio, p, 70000) <= -120.0


def test_segment_engine_matches_scan_inertia(audio):
    n = len(audio)
    p = tape.TapeParams(
        markers=[n // 3, (2 * n) // 3],
        section_speeds=[0.5, 3.5, 1.0],
        section_reverse=[False, False, True],
        inertia_enabled=True, inertia_amount=80, current_speed=2.0,
        tape_age=30)
    assert _seg_vs_scan(audio, p, 70000) <= -120.0


def test_segment_engine_matches_scan_inertia_strong(audio):
    n = len(audio)
    p = tape.TapeParams(
        markers=[n // 2],
        section_speeds=[4.0, 0.25],
        section_reverse=[False, False],
        inertia_enabled=True, inertia_amount=100, current_speed=0.25,
        enable_splice_fx=True, anticlick_enabled=True)
    assert _seg_vs_scan(audio, p, 100000) <= -120.0


def test_native_trajectory_bit_equal_numpy(audio):
    """The C++ trajectory must equal the NumPy twin bit-for-bit (including
    quantized inertia) — this pins the native runtime's float semantics."""
    from audio_suite_tpu.utils import native_rt
    from audio_suite_tpu.ops import varispeed
    if native_rt.get_lib() is None:
        pytest.skip("no native toolchain")
    n = len(audio)
    p = tape.TapeParams(
        markers=[n // 4, n // 2, (3 * n) // 4],
        section_speeds=[1.3, 2.7, 0.31, 3.9],
        section_reverse=[False, True, False, True],
        inertia_enabled=True, inertia_amount=65, current_speed=2.0,
        tape_age=85, enable_splice_fx=True, anticlick_enabled=True)
    frames = 50000
    prog = tape.build_tape_program(audio, p, frames)
    a = native_rt.tape_trajectory(
        frames, n, prog["mod_q"], prog["starts"], prog["ends"],
        prog["speeds_q"], prog["reverse"], prog["boundaries"],
        prog["splice_env"], prog["consts"], 0, 0)
    b = varispeed.tape_trajectory(
        n, prog["mod_q"], prog["starts"], prog["ends"], prog["speeds_q"],
        prog["reverse"], prog["boundaries"], 256, prog["consts"])
    for k in ("idx0", "fr", "ga", "gs"):
        assert np.array_equal(a[k], b[k]), k
    assert a["final"] == b["final"]


def _dev_vs_scan(audio, params, frames):
    a = tape.render_tape(audio, params, frames, engine="scan")
    b = tape.render_tape(audio, params, frames, engine="device")
    return max_dev_dbfs(a, b)


def test_device_engine_matches_scan_full(audio):
    n = len(audio)
    p = tape.TapeParams(
        markers=[n // 5, n // 2, (3 * n) // 4],
        section_speeds=[1.0, 2.7, 0.31, 3.9],
        section_reverse=[False, True, False, True],
        tape_age=85, enable_splice_fx=True, anticlick_enabled=True,
        anticlick_amount=70)
    assert _dev_vs_scan(audio, p, 70000) <= -120.0


def test_device_engine_matches_scan_inertia(audio):
    n = len(audio)
    p = tape.TapeParams(
        markers=[n // 3, (2 * n) // 3],
        section_speeds=[0.5, 3.5, 1.0],
        section_reverse=[False, False, True],
        inertia_enabled=True, inertia_amount=80, current_speed=2.0,
        tape_age=30)
    assert _dev_vs_scan(audio, p, 70000) <= -120.0


def test_device_engine_accepts_device_audio(audio):
    """The tape can live on the device (loaded once, rendered many times);
    results must match the host-array path exactly."""
    import jax.numpy as jnp
    p = tape.TapeParams(markers=[12000, 30000],
                        section_speeds=[1.0, 2.0, 0.5],
                        section_reverse=[False, True, False], tape_age=50)
    a = tape.render_tape(audio, p, 40000, engine="device")
    b = tape.render_tape(jnp.asarray(audio), p, 40000, engine="device")
    assert np.array_equal(a, b)


def test_wow_flutter_device_twin_bit_exact():
    """The on-device wow/flutter synthesis must equal the host twin bit for
    bit — the device tape engine's increments depend on it."""
    import jax
    import jax.numpy as jnp
    from audio_suite_tpu.ops import varispeed

    for sr, age in [(48000, 60), (44100, 100), (192000, 5)]:
        T = 40960
        host = tape.wow_flutter_mod(T, sr, age)
        ints, flts, ph0 = tape.wow_flutter_consts(sr, age)
        dev = np.asarray(jax.jit(
            lambda: varispeed._wow_flutter_device(
                T, jnp.asarray(ints), jnp.asarray(flts), jnp.asarray(ph0)))())
        assert np.array_equal(host, dev), (sr, age)


def test_device_tables_splice_triggers_applied(audio):
    """A render crossing many boundaries must trigger splice envelopes in
    the device engine identically to the segment engine (gain > 1 bursts)."""
    n = len(audio)
    p = tape.TapeParams(
        markers=[n // 8, n // 4, (3 * n) // 8, n // 2],
        section_speeds=[4.0, 4.0, 4.0, 4.0, 4.0],
        section_reverse=[False] * 5,
        tape_age=0, enable_splice_fx=True, anticlick_enabled=False)
    a = tape.render_tape(audio, p, 60000, engine="segment")
    b = tape.render_tape(audio, p, 60000, engine="device")
    assert max_dev_dbfs(a, b) <= -120.0


def test_native_tables_equal_numpy(audio):
    """The C++ table builder (which also synthesizes its own wow/flutter
    mod) must match the NumPy twin: visits/triggers/final exactly, and the
    speed-run tables must expand to bit-identical per-sample speed ints."""
    from audio_suite_tpu.utils import native_rt
    from audio_suite_tpu.ops import varispeed
    if native_rt.get_lib() is None:
        pytest.skip("no native toolchain")

    def expand(tb, T):
        rs = tb["run_start"].astype(np.int64)
        s0 = tb["run_s0"].astype(np.int64)
        m = tb["run_m"].astype(np.int64)
        ii = np.arange(T, dtype=np.int64)
        rid = np.searchsorted(rs, ii, side="right") - 1
        return s0[rid] + m[rid] * (ii - rs[rid])

    n = len(audio)
    p = tape.TapeParams(
        markers=[n // 4, n // 2, (3 * n) // 4],
        section_speeds=[1.3, 2.7, 0.31, 3.9],
        section_reverse=[False, True, False, True],
        inertia_enabled=True, inertia_amount=65, current_speed=2.0,
        tape_age=85, enable_splice_fx=True, anticlick_enabled=True)
    T = 50000
    prog = tape.build_tape_program(audio, p, T)
    a = native_rt.tape_tables(T, n, prog["mod_consts"], prog["starts"],
                              prog["ends"], prog["speeds_q"],
                              prog["reverse"], prog["boundaries"], 256,
                              prog["consts"])
    b = varispeed.tape_tables(n, prog["mod_q"], prog["starts"],
                              prog["ends"], prog["speeds_q"],
                              prog["reverse"], prog["boundaries"], 256,
                              prog["consts"])
    for k in ("visit_start", "visit_bw", "visit_bf", "visit_sec",
              "triggers"):
        assert np.array_equal(a[k], b[k]), k
    assert np.array_equal(expand(a, T), expand(b, T))
    assert a["final"] == b["final"]


def test_native_tables_fast_path_equal_numpy(audio):
    """The vectorized inertia-off C++ path (period-table mod synthesis,
    chunked prefix crossing search, windowed splice-trigger search) must
    match the NumPy twin exactly — including reverse sections, whose
    boundary hits arrive in decreasing-index time order."""
    from audio_suite_tpu.utils import native_rt
    from audio_suite_tpu.ops import varispeed
    if native_rt.get_lib() is None:
        pytest.skip("no native toolchain")

    def expand(tb, T):
        rs = tb["run_start"].astype(np.int64)
        s0 = tb["run_s0"].astype(np.int64)
        m = tb["run_m"].astype(np.int64)
        ii = np.arange(T, dtype=np.int64)
        rid = np.searchsorted(rs, ii, side="right") - 1
        return s0[rid] + m[rid] * (ii - rs[rid])

    n = len(audio)
    rng = np.random.default_rng(11)
    for trial in range(6):
        nm = int(rng.integers(1, 6))
        markers = sorted(rng.choice(
            np.arange(1000, n - 1000), nm, replace=False).tolist())
        ns = nm + 1
        p = tape.TapeParams(
            markers=markers,
            section_speeds=[float(rng.choice(
                [0.25, 0.31, 0.5, 1.0, 1.7, 2.7, 4.0])) for _ in range(ns)],
            section_reverse=[bool(rng.integers(0, 2)) for _ in range(ns)],
            inertia_enabled=False,
            tape_age=int(rng.integers(0, 101)),
            enable_splice_fx=True, anticlick_enabled=True)
        T = int(rng.integers(30000, 90000))
        prog = tape.build_tape_program(audio, p, T)
        a = native_rt.tape_tables(
            T, n, prog["mod_consts"], prog["starts"], prog["ends"],
            prog["speeds_q"], prog["reverse"], prog["boundaries"], 256,
            prog["consts"])
        b = varispeed.tape_tables(
            n, prog["mod_q"], prog["starts"], prog["ends"],
            prog["speeds_q"], prog["reverse"], prog["boundaries"], 256,
            prog["consts"])
        for k in ("visit_start", "visit_bw", "visit_bf", "visit_sec",
                  "triggers"):
            assert np.array_equal(a[k], b[k]), (trial, k)
        assert np.array_equal(expand(a, T), expand(b, T)), trial
        assert a["final"] == b["final"], trial


def test_param_tweaks_reuse_compiled_kernels(audio):
    """A fresh program per param tweak must NOT mint new XLA kernels: the
    round-3 regression was ~2 s of hidden slice/drain recompiles per
    distinct frame count (out[:T] slicing, per-length pulls), which
    dominated every fresh-program render.  Pin: the render kernel's jit
    cache stays flat across tweaked programs, the padded output shape is
    bucket-stable, and the trigger tables stay in one shape bucket."""
    import dataclasses
    from audio_suite_tpu.ops import varispeed

    sr = 8000
    n = len(audio)
    p = tape.TapeParams(sample_rate=sr, markers=[6000, 11000],
                        section_speeds=[1.0, 2.0, 0.5],
                        section_reverse=[False, True, False],
                        tape_age=60, enable_splice_fx=True,
                        anticlick_enabled=True)
    fr = tape.section_render_length(p, n)
    prog = tape.build_tape_program(audio, p, fr)
    y0, _ = tape.tape_table_render(prog, device_out=True)
    base_cache = varispeed.tape_device_render._cache_size()
    shapes = {np.asarray(y0).shape}
    for it in range(4):
        pp = dataclasses.replace(
            p, section_speeds=list(p.section_speeds),
            section_reverse=list(p.section_reverse))
        pp.section_speeds[it % 3] *= (1.0 + 0.003 * (1 + it))
        fr2 = tape.section_render_length(pp, n)
        prog2 = tape.build_tape_program(audio, pp, fr2)
        y, _ = tape.tape_table_render(prog2, device_out=True)
        shapes.add(np.asarray(y).shape)
        # pulled path slices to the exact frame count on the host
        full, _ = tape.tape_table_render(prog2)
        assert full.shape[0] == fr2
    assert varispeed.tape_device_render._cache_size() == base_cache, \
        "param tweaks recompiled the render kernel"
    assert len(shapes) == 1, f"padded output shape not bucket-stable: {shapes}"


def test_pathological_markers_fall_back_to_gather(audio):
    """Dense marker spacing makes the blockwise read's section-wrap patch
    set unbounded (or larger than the block count, which would crash
    top_k): the host feasibility check must fall back to the pair-gather
    engine and still render, for both interpolation modes."""
    sr = 8000
    p = tape.TapeParams(sample_rate=sr,
                        markers=list(range(100, 15900, 150)),
                        section_speeds=[1.5] * 110)
    for interp in ("linear", "sinc"):
        y = tape.render_tape(audio, p, 20000, interp=interp)
        y = np.asarray(y)
        assert y.shape[0] == 20000 and np.isfinite(y).all(), interp
