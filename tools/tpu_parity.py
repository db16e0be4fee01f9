"""On-hardware parity sweep: every engine vs its NumPy oracle on the
CURRENT default JAX device (run on the real TPU; the CPU test suite cannot
catch TPU-only numerics — this sweep caught jnp.convolve silently lowering
to bf16 on the MXU at -51 dBFS).

    python tools/tpu_parity.py            # quick sweep (seconds)
    python tools/tpu_parity.py --long     # + long-render configs (minutes:
                                          #   >=60 s / >=2k-note Pattern Lab,
                                          #   60 s tape, 60 s scrub — the
                                          #   error-accumulation regime the
                                          #   quick sweep cannot see)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from audio_suite_tpu.utils.metrics import max_dev_dbfs  # noqa: E402


def main():
    import jax
    print(f"device: {jax.devices()[0]}")
    failures = []

    def report(tag, dev, limit=-60.0):
        ok = dev <= limit
        print(f"{tag:<28} {dev:8.1f} dBFS   {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(tag)

    sr = 48000
    rng = np.random.default_rng(7)
    t = np.arange(sr * 2) / sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.1 * rng.standard_normal(t.size)).astype(np.float32)

    from audio_suite_tpu.models import tape
    from oracles.tape_ref import render_tape_np
    p = tape.TapeParams(sample_rate=sr, markers=[30000, 60000],
                        section_speeds=[1.0, 2.5, 0.4],
                        section_reverse=[False, True, False],
                        tape_age=70, inertia_enabled=True, inertia_amount=50)
    prog = tape.build_tape_program(audio, p, 40000)
    report("tape (inertia/splice/rev)",
           max_dev_dbfs(tape.render_tape(audio, p, 40000),
                        render_tape_np(prog)), -120.0)

    from audio_suite_tpu.models import scrub
    from oracles.scrub_ref import render_scrub_np
    cfg = scrub.ScrubConfig(sample_rate=sr, seed=5, head_count=3)
    trace = scrub.scripted_gesture_trace(
        40, sr, drag_events=[(0.2, 5.0, 0.3)], base_speed=0.5,
        jumps=[(0.5, 9000.0)])
    sprog = scrub.build_scrub_program(audio, cfg, trace, with_inc=True)
    report("scrub (3 heads/jump)",
           max_dev_dbfs(scrub.render_scrub(audio, cfg, trace),
                        render_scrub_np(sprog)), -120.0)

    # --- TapeTrace live performance (round-4 path: trace-segmented table
    # programs threading position/speed/splice/LFO state, tape.py:601-743)
    trace = tape.TapeTrace()
    trace.add(0.20, "set_speed", section=0, value=1.7)
    trace.add(0.45, "set_reverse", section=1, value=True)
    trace.add(0.70, "set_age", value=95)
    trace.add(0.90, "add_marker", sample=sr // 2)
    trace.add(1.10, "set_inertia", value=True)
    trace.add(1.15, "set_inertia_amount", value=80)
    trace.add(1.40, "seek", sample=100)
    trace.add(1.60, "retime", target=1.2)
    pt = tape.TapeParams(sample_rate=sr, markers=[30000, 60000],
                         section_speeds=[1.0, 0.5, 2.0],
                         section_reverse=[False, False, True],
                         tape_age=40, current_speed=1.0)
    nf_tr = sr * 2
    segs = tape.build_trace_programs(audio, pt, trace, nf_tr)
    rem, sidx = 0, 0
    seg_outs = []
    for s in segs:
        o, st = render_tape_np(
            s, init={"whole": s["init_whole"], "frac": s["init_frac"],
                     "rem": rem, "sidx": sidx}, return_state=True)
        rem, sidx = st["rem"], st["sidx"]
        seg_outs.append(o)
    ref_tr = np.concatenate(seg_outs)
    report("tape TRACE (8-op live perf)",
           max_dev_dbfs(tape.render_tape_trace(audio, pt, trace,
                                               num_frames=nf_tr),
                        ref_tr), -100.0)

    # --- scrub live key events (round-4 path: per-control-segment reads
    # over one global position pass, scrub.py:648)
    ktrace = scrub.scripted_gesture_trace(
        60, sr, drag_events=[(0.3, 5.0, 0.4)], base_speed=0.5,
        jumps=[(0.9, 15000.0)],
        key_events=[(0.2, "2"), (0.4, "Z"), (0.4, "Z"), (0.6, "1"),
                    (0.8, "V"), (1.0, "3"), (1.1, "R"), (1.2, "Down")])
    kprog = scrub.build_scrub_program(audio, cfg, ktrace, 5000.0,
                                      with_inc=True)
    assert len(kprog["head_segments"]) >= 5
    report("scrub KEYS (live controls)",
           max_dev_dbfs(scrub.render_scrub(audio, cfg, ktrace, 5000.0),
                        render_scrub_np(kprog)), -60.0)

    from audio_suite_tpu.models import microsound as ms
    from oracles.microsound_ref import render_ref
    for mode in ("Noise burst", "Micro-chaos", "Dust impulses",
                 "Crackle / corona", "Wavelet atoms", "Stick–slip friction"):
        mp = ms.MicrosoundParams.from_dict(dict(
            base_sr=8000, out_dur_s=0.4, time_unfold=2.0, micro_ms=4.0,
            seed=4242, grains_per_sec=20.0, max_grains=64, gen_mode=mode,
            bandlimit_on=True, bandlimit_out_hz=3000.0,
            bandlimit_roll_hz=500.0, er_cloud_on=True, er_taps=64,
            er_max_ms=20.0, stereo_on=True, partial_stretch=1.5,
            bp_density="", bp_unfold="", bp_cutoff="", bp_stretch=""))
        mprog = ms.build_program(mp)
        out, _ = ms.render(mp)
        report(f"microsound {mode[:16]}",
               max_dev_dbfs(out, render_ref(mp, mprog)))

    # high-rate NON-shared warp chain: per-event stretch breakpoints at a
    # design rate that pushes L past the MXU-DFT threshold (16384), so
    # the vmapped per-event spectral path exercises ops/mxu_fft.py on
    # this device (the small-L configs above fall through to XLA's fft)
    mp = ms.MicrosoundParams.from_dict(dict(
        base_sr=96000, out_dur_s=0.25, time_unfold=60.0, micro_ms=4.0,
        seed=77, grains_per_sec=40.0, max_grains=16,
        gen_mode="Noise burst", bandlimit_on=True,
        bandlimit_out_hz=18000.0, bandlimit_roll_hz=2500.0,
        nl_warp_on=True, nl_warp_power=1.3, er_cloud_on=False,
        stereo_on=True, bp_density="", bp_unfold="", bp_cutoff="",
        bp_stretch="0:1.0, 0.12:2.4"))
    mprog = ms.build_program(mp)
    assert int(mprog["L"]) >= 16384, mprog["L"]
    out, _ = ms.render(mp)
    report("microsound warp hi-rate", max_dev_dbfs(out, render_ref(mp, mprog)))

    from audio_suite_tpu.models import patternlab as pl
    from oracles.patternlab_ref import render_np
    rc = pl.RenderConfig(sample_rate=22050, seconds=1.0, bpm=140, seed=4)
    events = pl.generate("Glass Cells", rc) + pl.generate("Fibonacci Gate",
                                                          rc)[:20]
    y, ev = pl.render(events, rc)
    report("patternlab FM+PSG", max_dev_dbfs(y, render_np(ev, rc)))

    from audio_suite_tpu.models import forestfire as ff
    from oracles.forestfire_ref import simulate_np
    model = ff.ForestFireModel(ff.ModelParams(w=64, h=48), seed=3)
    model.ignite_at(30, 20, radius=3)
    carry0 = {k: (v.copy() if isinstance(v, np.ndarray) else v)
              for k, v in model._np.items()}
    stats = model.simulate(60)
    _, stats_ref = simulate_np(carry0, 60, ff.ModelParams(w=64, h=48),
                               seed=3)
    exact = bool(np.array_equal(stats, stats_ref))
    print(f"{'forestfire CA (60 steps)':<28} "
          f"{'bit-exact' if exact else 'DIVERGED':>13}   "
          f"{'OK' if exact else 'FAIL'}")
    if not exact:
        failures.append("forestfire")

    # grid: device table mixdown must equal the host twin BIT-FOR-BIT on
    # this device (integer placement + envdet twins), and the ring OA
    # kernel must match the sequential DUS accumulation exactly
    from audio_suite_tpu.models import grid
    from audio_suite_tpu.ops import envdet
    import jax.numpy as jnp
    from audio_suite_tpu.ops import pallas_oa as poa
    n_total = sr * 2
    g_rng = np.random.default_rng(11)
    rows = [
        {"pat": g_rng.uniform(-0.5, 0.5, 17321).astype(np.float32),
         "start_idx": 0, "loop": True,
         "resets": np.asarray([4000, 61000], np.int32), "mod_src": -1,
         "win": 1200, "a_q12": 0, "gain": 1.0},
        {"pat": g_rng.uniform(-0.5, 0.5, 9001).astype(np.float32),
         "start_idx": -500, "loop": True, "resets": np.zeros(0, np.int32),
         "mod_src": 0, "win": 960, "a_q12": envdet.amount_q12(0.9),
         "gain": float(np.float32(0.7))},
    ]
    mix_d = grid._device_mixdown(n_total, rows)
    mix_h, _ = grid._host_mixdown(n_total, rows, False)
    eq = bool(np.array_equal(mix_d, mix_h))
    print(f"{'grid device==host mixdown':<28} "
          f"{'bit-exact' if eq else 'DIVERGED':>13}   "
          f"{'OK' if eq else 'FAIL'}")
    if not eq:
        failures.append("grid")

    if poa.ring_available():
        E, L = 24, 4096
        out_len = poa.ring_out_len(sr, L)
        vals = g_rng.standard_normal((E, L)).astype(np.float32)
        starts = np.sort(g_rng.integers(0, sr, E)).astype(np.int64) + L
        rel, nflush, plan = poa.plan_ring(starts, L, out_len)
        o0 = jnp.zeros(out_len, jnp.float32)
        vj = jnp.asarray(vals)
        ring = np.asarray(poa.ring_overlap_add(o0, vj, rel, nflush))
        dus = np.asarray(poa.overlap_add_dus(
            o0, vj, jnp.asarray(starts.astype(np.int32))))
        eq = plan.feasible and bool(np.array_equal(ring, dus))
        print(f"{'ring OA == sequential DUS':<28} "
              f"{'bit-exact' if eq else 'DIVERGED':>13}   "
              f"{'OK' if eq else 'FAIL'}")
        if not eq:
            failures.append("ring_oa")

    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all engines within budget on this device")


def main_long():
    """Long-render parity on hardware (VERDICT r2 item 6): quantizer /
    phase-accumulation error grows with render length and note count, so
    the -60 dBFS budget must be demonstrated AT LENGTH on the TPU, not only
    at the quick sweep's seconds-scale configs."""
    import jax
    print(f"device: {jax.devices()[0]}  [long sweep]")
    failures = []

    def report(tag, dev, limit=-60.0):
        ok = dev <= limit
        print(f"{tag:<34} {dev:8.1f} dBFS   {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(tag)

    # --- Pattern Lab: 128 s, >=6000 notes (synth_fm.py:27-36 quantizer
    # error regime; round-5 bar from VERDICT r4 item 3) ---
    from audio_suite_tpu.models import patternlab as pl
    from oracles.patternlab_ref import render_np
    rc = pl.RenderConfig(sample_rate=44100, seconds=128.0, bpm=168, seed=17)
    events = []
    for gen in pl.list_generators():
        if gen == "Python Script":
            continue
        events.extend(pl.generate(gen, rc))
    t0 = time.perf_counter()
    y, ev = pl.render(events, rc)
    t_dev = time.perf_counter() - t0
    assert len(ev) >= 6000, f"long config must have >=6k notes, got {len(ev)}"
    t0 = time.perf_counter()
    ref = render_np(ev, rc)
    t_ref = time.perf_counter() - t0
    print(f"  patternlab: {len(ev)} notes / {rc.seconds:.0f} s "
          f"(device {t_dev:.1f} s, oracle {t_ref:.1f} s)")
    report(f"patternlab long ({len(ev)} notes)", max_dev_dbfs(y, ref))

    # --- Tape: 60 s render, mixed speeds/reverse, inertia + splice fx ---
    from audio_suite_tpu.models import tape
    from oracles.tape_ref import render_tape_np
    sr = 48000
    rng = np.random.default_rng(23)
    t = np.arange(sr * 60) / sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.3 * np.sin(2 * np.pi * 933 * t + 0.5)
             + 0.1 * rng.standard_normal(t.size)).astype(np.float32)
    n = len(audio)
    p = tape.TapeParams(
        sample_rate=sr, markers=[int(n * f) for f in (0.15, 0.4, 0.7)],
        section_speeds=[1.0, 2.5, 0.4, 1.7],
        section_reverse=[False, True, False, True],
        tape_age=70, inertia_enabled=True, inertia_amount=50,
        enable_splice_fx=True, anticlick_enabled=True)
    frames = sr * 60
    prog = tape.build_tape_program(audio, p, frames)
    t0 = time.perf_counter()
    y_t = tape.render_tape(audio, p, frames)
    t_dev = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref_t = render_tape_np(prog)
    t_ref = time.perf_counter() - t0
    print(f"  tape: {frames / sr:.0f} s render "
          f"(device {t_dev:.1f} s, oracle {t_ref:.1f} s)")
    report("tape long (60 s inertia/rev)", max_dev_dbfs(y_t, ref_t), -100.0)

    # --- Scrub: 60 s gesture, 3 heads, jumps + dropout ---
    from audio_suite_tpu.models import scrub
    from oracles.scrub_ref import render_scrub_np
    cfg = scrub.ScrubConfig(sample_rate=sr, seed=5, head_count=3)
    blocks = int(60.0 * sr / scrub.BLOCK_SIZE)
    trace = scrub.scripted_gesture_trace(
        blocks, sr,
        drag_events=[(2.0, 8.0, 3.0), (12.0, -14.0, 4.0), (25.0, 4.0, 5.0),
                     (40.0, -6.0, 6.0)],
        base_speed=0.5, jumps=[(18.0, 9000.0), (45.0, 120000.0)])
    sprog = scrub.build_scrub_program(audio[: sr * 10], cfg, trace,
                                      with_inc=True)
    t0 = time.perf_counter()
    y_s = scrub.render_scrub(audio[: sr * 10], cfg, trace)
    t_dev = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref_s = render_scrub_np(sprog)
    t_ref = time.perf_counter() - t0
    print(f"  scrub: {blocks * scrub.BLOCK_SIZE / sr:.0f} s render "
          f"(device {t_dev:.1f} s, oracle {t_ref:.1f} s)")
    report("scrub long (60 s, 3 heads)", max_dev_dbfs(y_s, ref_s), -100.0)

    if failures:
        print("LONG FAILURES:", failures)
        sys.exit(1)
    print("all long-render configs within budget on this device")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--long", action="store_true",
                    help="also run the long-render configs (minutes)")
    ap.add_argument("--long-only", action="store_true",
                    help="run ONLY the long-render configs")
    args = ap.parse_args()
    if not args.long_only:
        main()
    if args.long or args.long_only:
        main_long()
