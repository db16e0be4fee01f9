"""Benchmark harness — BASELINE.json configs on the current JAX device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
metric = geometric-mean realtime factor (audio-seconds rendered per wall
second per chip) across the scored configs; baseline target = 1000x realtime
stereo 48 kHz per chip (BASELINE.md).  Per-config RTFs are included as extra
keys; failures are reported, not fatal.
"""
import json
import os
import sys
import time

import numpy as np

# persistent XLA compile cache: the driver runs this script in a fresh
# process; without the cache every run pays multi-minute TPU compiles for
# the large (multi-M-sample) kernels
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# BENCH_SMOKE=1: shrink every config to CI scale (seconds -> fractions of a
# second) so the SAME code paths — program builders, engine renders, the
# compute-timing protocol, link stats — run in a few seconds on CPU.  The
# numbers are meaningless in smoke mode; the point is that a refactor of
# any engine seam the bench touches fails the test suite instead of the
# driver's round-end scoring run (tests/test_bench_smoke.py).
_SMOKE = bool(int(os.environ.get("BENCH_SMOKE", "0") or "0"))


def _time_best(fn, repeats=3, check=None):
    """Best wall-clock of `repeats` timed runs after one warmup/compile.
    `check` (outputs dict) is asserted finite after the warmup so silent
    device NaNs can't masquerade as throughput."""
    fn()
    if check is not None:
        for k, v in check.items():
            assert np.isfinite(np.asarray(v)).all(), f"non-finite {k}"
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


_NULL_LAT = None


def _null_loop_latency():
    """Measured cost of the timing loop itself with ZERO compute: one
    trivial dispatch + the data-dependent scalar drain.  This is what
    _time_device subtracts — measured per run, per environment (local
    chip, tunnel, CPU), never assumed.  Median of 5 after warmup."""
    global _NULL_LAT
    if _NULL_LAT is None:
        import jax
        import jax.numpy as jnp

        trivial = jax.jit(lambda x: x + 1.0)
        y = trivial(jnp.zeros(8, jnp.float32))
        float(jnp.sum(jnp.abs(jnp.ravel(y)).astype(jnp.float32)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            y = trivial(y)
            float(jnp.sum(jnp.abs(jnp.ravel(y)).astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        _NULL_LAT = float(np.median(ts))
    return _NULL_LAT


def _time_device(fn, K=5):
    """Amortized per-dispatch seconds for a device-resident computation
    (compute-only RTF): K back-to-back async dispatches, one queue drain,
    minus the MEASURED null-loop latency (_null_loop_latency — not a
    hard-coded constant).  K grows adaptively until the loop is at least
    4x the null latency, so the subtraction can never fabricate
    throughput; if the measurement still comes out non-positive the raw
    unsubtracted per-dispatch time is returned (conservative).

    The drain is a DATA-DEPENDENT scalar readback (sum -> float), not
    block_until_ready: through the tunnel BUR has been observed returning
    before the queued work completes, which reports absurd throughputs."""
    import jax.numpy as jnp

    def drain(y):
        return float(jnp.sum(jnp.abs(jnp.ravel(y)).astype(jnp.float32)))

    lat = _null_loop_latency()
    y = fn()
    drain(y)                            # compile + settle
    while True:
        t0 = time.perf_counter()
        for _ in range(K):
            y = fn()
        drain(y)                        # device executes in order
        total = time.perf_counter() - t0
        if total >= 4.0 * lat or K >= 160:
            break
        K *= 4
    # best-of-3 at the settled K: a single loop's jitter (shared tunnel,
    # host scheduling) is +-15% on millisecond kernels; the MINIMUM of
    # repeated loops estimates the true device cost (noise only ADDS)
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(K):
            y = fn()
        drain(y)
        total = min(total, time.perf_counter() - t0)
    net = (total - lat) / K
    return net if net > 0 else total / K


def _best_s(fn, repeats=3):
    """Best wall-clock of `repeats` runs (no warmup — callers warm up)."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _decomp(extras, name, e2e_s, kernel_s, stages):
    """Per-engine end-to-end decomposition (VERDICT r4 item 5): e2e =
    host build + device kernel + d2h pull + host post + residual
    (dispatch/sync slop), all in ms.  `stages` maps label -> measured
    seconds.  host_nonlink_ms = everything the host computes per render
    outside the link pull — the number that must stay < 5 ms for the
    residual-is-link claim."""
    d = {"e2e_ms": round(e2e_s * 1e3, 2),
         "kernel_ms": round(kernel_s * 1e3, 2)}
    acc = kernel_s
    host = 0.0
    for label, sec in stages.items():
        d[f"{label}_ms"] = round(sec * 1e3, 2)
        acc += sec
        if label == "build" or label.startswith("host"):
            host += sec
    d["residual_ms"] = round((e2e_s - acc) * 1e3, 2)
    d["host_nonlink_ms"] = round(host * 1e3, 2)
    extras[f"decomp_{name}"] = d


def _test_audio(sr, seconds, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.3 * np.sin(2 * np.pi * 933 * t + 0.5)
         + 0.1 * rng.standard_normal(t.size))
    return (x / np.max(np.abs(x))).astype(np.float32)


def bench_tape(extras):
    """Config 1: chopped varispeed render, mixed speeds fwd/rev,
    duration-preserving retime (BASELINE.json config 1).

    STEREO 48 kHz per the north-star metric text.  The reference app is
    mono (Tape…py:14-47); a stereo export of it carries IDENTICAL samples
    on both channels, so the render pulls mono PCM16 and duplicates the
    channel on the host INSIDE the timed region — pulling duplicated
    bytes through the ~40 MB/s tunnel would only time the link twice,
    not the render.  (The host duplication is ~10 ms; it is counted.)

    The tape is loaded to the device once (load != render, exactly like the
    reference app's load_audio vs provide_samples split); each timed render
    goes through the CACHED program build (models/tape.py
    build_tape_program_cached — the steady-state path a user re-rendering
    unchanged params pays) and pulls the audio.  The fresh-build cost is
    quoted separately by rtf_tape_param_tweak, whose every iteration
    changes a speed and so rebuilds program + tables."""
    import jax
    import jax.numpy as jnp
    from audio_suite_tpu.models import tape

    sr = 48000
    seconds = 4.0 if _SMOKE else 180.0   # BASELINE.json config 1: "chop 3-min WAV"
    audio = _test_audio(sr, seconds)
    n = len(audio)
    markers = [int(n * f) for f in (0.12, 0.3, 0.45, 0.6, 0.8)]
    params = tape.TapeParams(
        sample_rate=sr, markers=markers,
        section_speeds=[1.0, 2.0, 0.5, 4.0, 0.25, 1.5],
        section_reverse=[False, True, False, True, False, False],
        tape_age=60, enable_splice_fx=True, anticlick_enabled=True)
    params.section_speeds = tape.fit_to_target_time(params, n, seconds)
    frames = tape.section_render_length(params, n)
    adev = jax.device_put(jnp.asarray(audio))
    adev.block_until_ready()

    out = {}

    def run():
        # int16 PCM pull: the reference's output format (PCM_16 WAV,
        # Tape…py:342) at half the d2h bytes; mono pull -> host channel
        # duplication (identical samples by construction), inside timing
        prog = tape.build_tape_program_cached(adev, params, frames,
                                              with_mod=False)
        mono = tape.tape_table_render(prog, out_i16=True)[0]
        out["y"] = np.repeat(mono[:, None], 2, axis=1)

    wall = _time_best(run, check=out)

    # compute-only RTF: output stays on device (no d2h), same stereo
    # kernel — the transfer-bound vs compute-bound split BASELINE.md
    # documents
    prog = tape.build_tape_program(adev, params, frames, with_mod=False)
    kernel_s = _time_device(lambda: tape.tape_table_render(
        prog, device_out=True, stereo=True)[0])
    extras["rtf_tape_compute"] = round((frames / sr) / kernel_s, 2)

    # e2e decomposition: cached build / mono-i16 kernel / chunked pull /
    # host stereo dup.  The kernel stage re-times the MONO i16 variant the
    # e2e loop actually runs (the stereo number above serves the north-star
    # metric text).
    import jax.numpy as _jnp
    t_build = _best_s(lambda: tape.build_tape_program_cached(
        adev, params, frames, with_mod=False))
    kern_mono_s = _time_device(lambda: tape.tape_table_render(
        prog, out_i16=True, device_out=True)[0])
    ydev = tape.tape_table_render(prog, out_i16=True, device_out=True)[0]
    float(_jnp.sum(_jnp.abs(ydev[:8]).astype(_jnp.float32)))
    t_pull = _best_s(lambda: tape.chunked_pull(ydev, frames))
    mono_h = tape.chunked_pull(ydev, frames)
    t_dup = _best_s(lambda: np.repeat(mono_h[:, None], 2, axis=1))
    _decomp(extras, "tape", wall, kern_mono_s,
            {"build": t_build, "pull": t_pull, "host_post": t_dup})

    # param-tweak loop: every iteration changes a section speed, so the
    # host trajectory walk + table build run fresh; output stays on device
    # (isolates the host tail from the transfer bound)
    import dataclasses
    tweak = {"i": 0}

    def run_tweak():
        tweak["i"] += 1
        pp = dataclasses.replace(
            params,
            section_speeds=list(params.section_speeds),
            section_reverse=list(params.section_reverse))
        pp.section_speeds[tweak["i"] % len(pp.section_speeds)] *= \
            (1.0 + 0.001 * (tweak["i"] % 7))
        fr = tape.section_render_length(pp, n)
        prog2 = tape.build_tape_program(adev, pp, fr, with_mod=False)
        y = tape.tape_table_render(prog2, device_out=True, stereo=True)[0]
        return fr / sr, y

    asec, y = run_tweak()
    float(jnp.sum(jnp.abs(jnp.ravel(y)).astype(jnp.float32)))  # settle
    # best-of-3 loops of K=3: the host trajectory walk is the one bench
    # stage exposed to host scheduling noise, so it gets the same
    # minimum-of-repeats treatment as _time_device / _time_best
    K = 3
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            asec, y = run_tweak()
        float(jnp.sum(jnp.abs(jnp.ravel(y)).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    extras["rtf_tape_param_tweak"] = round(asec / max(1e-9, best / K), 2)
    return (frames / sr) / wall


def bench_scrub(extras):
    """Config 2: multi-head gestural scrub over a scripted trace.

    STEREO: the reference writes the SAME block to both output channels
    (scrubber_0.7.py:233-234), so the render pulls mono PCM16 and
    duplicates the channel on the host inside the timed region (pulling
    duplicated bytes would only time the tunnel twice)."""
    import numpy as np
    from audio_suite_tpu.models import scrub

    sr = 48000
    audio = _test_audio(sr, 2.0 if _SMOKE else 10.0)
    seconds = 2.0 if _SMOKE else 30.0
    blocks = int(seconds * sr / scrub.BLOCK_SIZE)
    cfg = scrub.ScrubConfig(sample_rate=sr, head_count=3)
    trace = scrub.scripted_gesture_trace(
        blocks, sr, drag_events=[(2.0, 8.0, 3.0), (10.0, -14.0, 4.0),
                                 (20.0, 4.0, 5.0)],
        base_speed=0.5, jumps=[(15.0, 1000.0)])
    out = {}
    audio_sec = blocks * scrub.BLOCK_SIZE / sr

    def run():
        mono = scrub.render_scrub(audio, cfg, trace, pcm16=True)
        out["y"] = np.repeat(mono[:, None], 2, axis=1)

    wall = _time_best(run, check=out)

    # compute-only: prebuilt program, kernel-only timing (comparable to
    # rtf_tape_compute/rtf_grid_compute which also pre-build)
    from audio_suite_tpu.ops import fixq
    import jax
    import jax.numpy as jnp
    prog = scrub.build_scrub_program(audio, cfg, trace, 0.0)
    span = scrub.span_bound_blocks(prog["base_inc_q"], prog["js_q"])
    span = 1 << (span - 1).bit_length()
    adev = jax.device_put(jnp.asarray(prog["audio"]))
    adev.block_until_ready()
    heads_integer = bool(np.all(prog["head_off_frac"] == 0))
    kargs = (adev, prog["base_inc_q"], prog["js_q"],
             np.uint32(prog["seed"]), prog["mod_consts"],
             prog["jump_flags"], prog["seg_bases_whole"],
             prog["seg_bases_frac"], prog["env_blocks"],
             prog["head_off_whole"], prog["head_off_frac"],
             np.float32(prog["head_gain"]))
    extras["rtf_scrub_compute"] = round(audio_sec / _time_device(
        lambda: scrub.scrub_render_kernel(
            *kargs, block_size=prog["block_size"], span_blocks=span,
            heads_integer=heads_integer, stereo=True)), 2)
    del fixq

    # e2e decomposition: cached trace expansion / mono-i16 kernel (the
    # variant the e2e loop runs, incl. the ~0.05 ms cached build) /
    # chunked pull / host stereo dup
    t_build = _best_s(lambda: scrub.build_scrub_program_cached(
        audio, cfg, trace, 0.0))
    kern_mono_s = _time_device(lambda: scrub.render_scrub(
        audio, cfg, trace, pcm16=True, device_out=True))
    ydev = scrub.render_scrub(audio, cfg, trace, pcm16=True,
                              device_out=True)
    float(jnp.sum(jnp.abs(ydev[:8]).astype(jnp.float32)))
    from audio_suite_tpu.utils.transfer import chunked_pull
    t_pull = _best_s(lambda: chunked_pull(ydev))
    mono_h = chunked_pull(ydev)
    t_dup = _best_s(lambda: np.repeat(mono_h[:, None], 2, axis=1))
    _decomp(extras, "scrub", wall, kern_mono_s,
            {"build": t_build, "pull": t_pull, "host_post": t_dup})
    return audio_sec / wall


def bench_microsound(extras):
    """Config 3: high-rate band-limited transient field, x100 time unfold,
    x4 spectral stretch, IR convolution."""
    from audio_suite_tpu.models import microsound as ms

    sr = 48000 if _SMOKE else 192000
    seconds = 0.5 if _SMOKE else 4.0
    rng = np.random.default_rng(11)
    ir = (rng.standard_normal(8192) * np.exp(-np.arange(8192) / 800.0)) \
        .astype(np.float32)
    p = ms.MicrosoundParams.from_dict(dict(
        base_sr=sr, out_dur_s=seconds, time_unfold=100.0,
        gen_mode="Noise burst", micro_ms=1.0, grains_per_sec=60.0,
        max_grains=24 if _SMOKE else 400, partial_stretch=4.0, bandlimit_on=True,
        bandlimit_out_hz=18000.0, bandlimit_roll_hz=2500.0,
        er_cloud_on=True, space_ir_on=True, stereo_on=True,
        bp_density="", bp_unfold="", bp_cutoff="", bp_stretch="", seed=5))
    out = {}

    def run():
        out["y"], _ = ms.render(p, ir_audio=ir, pcm16=True)

    wall = _time_best(run, repeats=2, check=out)

    # compute-only: the fused single-chunk device call, output on device
    import jax
    import jax.numpy as jnp
    from audio_suite_tpu.ops import pallas_oa, space
    prog = ms.build_program(p, ir_audio=ir)
    ec = max(1, min(prog["E"], (1 << 26) // max(1, prog["L"])))
    chunks, ring_ok = ms._chunk_events(prog, ec)
    oa = "ring" if (ring_ok and pallas_oa.ring_available()) else "dus"
    cfg = ms.chain_cfg(p, prog, ec, oa=oa)
    er = space.er_tap_kernel(int(p.er_taps), float(p.er_max_ms), sr,
                             int(p.seed))
    irm = ir[:8192].astype(np.float32)
    er_comb = np.convolve(er.astype(np.float64),
                          irm.astype(np.float64)).astype(np.float32)
    fx = ms.FxCfg(out_n=prog["out_n"], sr=sr,
                  env=(float(p.env_a), float(p.env_d), float(p.env_s),
                       float(p.env_r), float(p.env_curve)),
                  er_on=True, ir_on=True, stereo_on=True,
                  stereo_width=float(p.stereo_width),
                  sat_drive=float(p.sat_drive), peak=float(p.peak))
    fused = ms._fused_fn(cfg, fx)
    c0 = {k: jnp.asarray(v) for k, v in chunks[0].items()}
    # the ER*IR kernel and the raw IR go up ONCE: passing them as numpy
    # would re-upload ~100 KB h2d inside every timed dispatch — host-side
    # serialization that is not part of the device-resident metric and
    # dominates the jitter under tunnel load
    er_dev = jax.device_put(jnp.asarray(er_comb))
    irm_dev = jax.device_put(jnp.asarray(irm))
    kernel_s = _time_device(lambda: fused(c0, None, er_dev, irm_dev)[2])
    extras["rtf_microsound_compute"] = round(seconds / kernel_s, 2)
    extras["microsound_oa"] = oa

    # e2e decomposition: fresh program build (render() rebuilds per call —
    # the event tables depend on every generator param) / fused kernel /
    # chunked pull; residual = event-chunk h2d + dispatch
    t_build = _best_s(lambda: ms.build_program(p, ir_audio=ir))
    ydev, _meta = ms.render(p, ir_audio=ir, pcm16=True, device_out=True)
    float(jnp.sum(jnp.abs(jnp.ravel(ydev)[:8]).astype(jnp.float32)))
    from audio_suite_tpu.utils.transfer import chunked_pull
    t_pull = _best_s(lambda: chunked_pull(ydev))
    _decomp(extras, "microsound", wall, kernel_s,
            {"build": t_build, "pull": t_pull})

    # the north-star metric text says "stereo 48 kHz": the same pipeline
    # at 48 kHz output (x100 unfold -> 4.8 MHz design rate) — the 192 kHz
    # config above is the 4x-harder superset
    p48 = ms.MicrosoundParams.from_dict({**p.to_dict(), "base_sr": 48000})
    prog48 = ms.build_program(p48, ir_audio=ir)
    ec48 = max(1, min(prog48["E"], (1 << 26) // max(1, prog48["L"])))
    chunks48, ring48 = ms._chunk_events(prog48, ec48)
    oa48 = "ring" if (ring48 and pallas_oa.ring_available()) else "dus"
    cfg48 = ms.chain_cfg(p48, prog48, ec48, oa=oa48)
    er48 = space.er_tap_kernel(int(p48.er_taps), float(p48.er_max_ms),
                               48000, int(p48.seed))
    er48c = np.convolve(er48.astype(np.float64),
                        irm.astype(np.float64)).astype(np.float32)
    fx48 = ms.FxCfg(out_n=prog48["out_n"], sr=48000,
                    env=fx.env, er_on=True, ir_on=True, stereo_on=True,
                    stereo_width=fx.stereo_width, sat_drive=fx.sat_drive,
                    peak=fx.peak)
    fused48 = ms._fused_fn(cfg48, fx48)
    c48 = {k: jnp.asarray(v) for k, v in chunks48[0].items()}
    er48_dev = jax.device_put(jnp.asarray(er48c))
    extras["rtf_microsound_48k_compute"] = round(seconds / _time_device(
        lambda: fused48(c48, None, er48_dev, irm_dev)[2]), 2)
    return seconds / wall


def bench_patternlab(extras):
    """Config 4: batch render of algorithmic patterns through the vmapped
    FM+PSG voice bank."""
    from audio_suite_tpu.models import patternlab as pl

    cfg = pl.RenderConfig(sample_rate=44100, seconds=2.0 if _SMOKE else 8.0,
                          bpm=128, seed=9)
    events = []
    for gen in pl.list_generators():
        if gen == "Python Script":
            continue
        events.extend(pl.generate(gen, cfg))
    out = {}

    def run():
        out["y"], _ = pl.render(events, cfg, pcm16=True)

    wall = _time_best(run, repeats=2, check=out)

    # compute-only: prepared program (device-resident packs), one jit
    # dispatch per call — the SAME protocol as the other configs
    # (microsound times its fused call on a pre-uploaded chunk; tape
    # quotes the host walk separately).  The host prepare pass is
    # reported on its own line.
    ev = pl.apply_time_ops(events, cfg)
    synth = pl.MegaDriveInspiredSynth(cfg.sample_rate, seed=cfg.seed)
    t0 = time.perf_counter()
    prep = synth.prepare(ev, cfg.seconds)
    extras["patternlab_prepare_ms"] = round(
        (time.perf_counter() - t0) * 1e3, 2)
    kernel_s = _time_device(
        lambda: synth.render_prepared(prep, master_gain=cfg.master_gain,
                                      device_out=True))
    extras["rtf_patternlab_compute"] = round(cfg.seconds / kernel_s, 2)

    # e2e decomposition: cache-hit build (render() memoizes time-ops +
    # prepare on events identity; the hit pays one cfg JSON dump) /
    # i16 kernel / chunked pull.  The fresh prepare cost is
    # patternlab_prepare_ms above.
    import dataclasses as _dc
    import json as _json

    import jax.numpy as jnp
    t_build = _best_s(lambda: _json.dumps(_dc.asdict(cfg), sort_keys=True,
                                          default=str))
    kern16_s = _time_device(
        lambda: synth.render_prepared(prep, master_gain=cfg.master_gain,
                                      device_out=True, pcm16=True))
    ydev = synth.render_prepared(prep, master_gain=cfg.master_gain,
                                 device_out=True, pcm16=True)
    float(jnp.sum(jnp.abs(jnp.ravel(ydev)[:8]).astype(jnp.float32)))
    from audio_suite_tpu.utils.transfer import chunked_pull
    t_pull = _best_s(lambda: chunked_pull(ydev))
    _decomp(extras, "patternlab", wall, kern16_s,
            {"build": t_build, "pull": t_pull})
    return cfg.seconds / wall


def bench_grid_forestfire(extras):
    """Config 5: multi-track grid mixdown + Forest Fire CA emitting
    OSC-style threshold event streams.  RTF counts the mixdown audio; the CA
    must sustain >= its 30 Hz reference tick rate on the same wall clock.

    The timed path is the PUBLIC API — grid.render_mixdown(project) on a
    project of real py-cells from examples/cells/ — so the number includes
    the host pre-pass every real project pays: restart-event resolution,
    user-script cell rendering, pattern assembly, and the device mixdown
    + PCM16 pull."""
    import numpy as np
    from audio_suite_tpu.models import grid, forestfire as ff
    from audio_suite_tpu.events import rules as R

    sr = 48000
    seconds = 4.0 if _SMOKE else 16.0
    cells_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "examples", "cells")
    cell_files = ["slow_pulse_pad.py", "euclid_clicks.py",
                  "shard_scatter.py", "poly_impulses.py"]

    tracks = []
    for ti in range(4):
        t = grid.Track(name=f"t{ti}", mode="duration",
                       duration_seconds=2.0 + ti, uniform_n=8,
                       loop_to_master=True, gain_db=-3.0 * ti,
                       sync_points_text="4.0, 9.5" if ti else "")
        if ti >= 1:
            t.mod_source_index = ti - 1
            t.mod_amount = 0.6
        t.ensure_cells(t.uniform_n)
        for ci in range(t.uniform_n):
            t.cells[ci] = grid.CellSource(
                kind="py", path=os.path.join(cells_dir, cell_files[ti]))
        tracks.append(t)
    project = grid.GridProject(
        tracks=tracks, master=grid.MasterClock("fixed_seconds", seconds),
        sample_rate=sr)

    model = ff.ForestFireModel(ff.ModelParams(), seed=2)
    model.ignite_at(110, 80, radius=4)
    eng = R.WatchEngine(now_fn=lambda: 0.0)
    eng.set_rules([R.ThresholdRule(metric_key="burning", op=">",
                                   threshold=50, edge="rising",
                                   cooldown_s=0.0)])
    rec = R.OSCRecorder()
    n_ca_steps = int(seconds * 30)   # reference tick rate over same window

    out = {}

    def run():
        out["mix"] = grid.render_mixdown(project, pcm16=True)
        stats = model.simulate(n_ca_steps)
        eng.run_stream(ff.stats_rows_to_dicts(stats), rec.send)

    wall = _time_best(run, repeats=2, check=out)

    # compute-only: prebuilt program (bank resident on device), one-call
    # mixdown kernel
    n_total, rows = grid._build_mix_program(project)
    prep = grid.prepare_device_mix(n_total, rows)
    extras["rtf_grid_compute"] = round(seconds / _time_device(
        lambda: grid._device_mixdown(n_total, rows, device_out=True,
                                     prepared=prep)), 2)

    # e2e decomposition: cache-hit build (render_mixdown memoizes the
    # program + prepared bank on project content; the hit pays one
    # blake2b over the project JSON + cell-file stats) / i16 mixdown
    # kernel / chunked pull / the CA+rules workload the e2e loop also
    # runs (its own device scan + stats pull, reported as one stage)
    import jax.numpy as jnp
    t_build = _best_s(lambda: grid.build_mix_program_cached(project))
    prep16 = grid.prepare_device_mix(n_total, rows, pcm16=True)
    kern16_s = _time_device(
        lambda: grid._device_mixdown(n_total, rows, device_out=True,
                                     pcm16=True, prepared=prep16))
    ydev = grid._device_mixdown(n_total, rows, device_out=True,
                                pcm16=True, prepared=prep16)
    float(jnp.sum(jnp.abs(jnp.ravel(ydev)[:8]).astype(jnp.float32)))
    from audio_suite_tpu.utils.transfer import chunked_pull
    t_pull = _best_s(lambda: chunked_pull(ydev, n_total))

    def run_ca():
        stats = model.simulate(n_ca_steps)
        eng.run_stream(ff.stats_rows_to_dicts(stats), rec.send)

    t_ca = _best_s(run_ca)
    _decomp(extras, "grid", wall, kern16_s,
            {"build": t_build, "pull": t_pull, "ca": t_ca})
    return seconds / wall


def _link_stats(extras):
    """Measured environment context: the null-loop latency the compute
    numbers subtract, and the d2h bandwidth that bounds every end-to-end
    column — so a reader can tell tunnel weather from code changes."""
    import jax
    import jax.numpy as jnp

    extras["null_loop_latency_ms"] = round(_null_loop_latency() * 1e3, 2)
    buf = jax.jit(lambda x: x + 1)(jnp.zeros(4 << 20, jnp.int16))  # 8 MB
    buf.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(buf)
    dt = time.perf_counter() - t0
    extras["d2h_MBps"] = round(8.0 / max(1e-9, dt), 1)


def main():
    results = {}
    failures = {}
    extras = {}
    try:
        _link_stats(extras)
    except Exception:
        pass
    import inspect
    for name, fn in [("tape", bench_tape), ("scrub", bench_scrub),
                     ("microsound", bench_microsound),
                     ("patternlab", bench_patternlab),
                     ("grid_forestfire", bench_grid_forestfire)]:
        try:
            if "extras" in inspect.signature(fn).parameters:
                results[name] = fn(extras)
            else:
                results[name] = fn()
        except Exception as e:  # report, don't die
            failures[name] = f"{type(e).__name__}: {e}"
            print(f"[bench] {name} FAILED: {failures[name]}",
                  file=sys.stderr)

    if results:
        logs = [np.log(max(1e-9, v)) for v in results.values()]
        geomean = float(np.exp(np.mean(logs)))
    else:
        geomean = 0.0

    line = {
        "metric": "rtf_geomean",
        "value": round(geomean, 2),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(geomean / 1000.0, 4),
    }
    for k, v in results.items():
        line[f"rtf_{k}"] = round(v, 2)
    line.update(extras)
    if failures:
        line["failures"] = failures
    print(json.dumps(line))


if __name__ == "__main__":
    main()
