"""Device->host transfer helpers and device-side stereo export paths
(round-3 additions: utils/transfer.chunked_pull, the `stereo` flag on the
tape/scrub kernels, grid's pcm16 public path + device bank cache)."""
import numpy as np
import jax
import jax.numpy as jnp

from audio_suite_tpu.models import grid, scrub, tape
from audio_suite_tpu.utils.transfer import chunked_pull


def _test_audio(sr=48000, seconds=1.0, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * rng.standard_normal(t.size))
    return (x / np.max(np.abs(x))).astype(np.float32)


def test_chunked_pull_matches_asarray():
    rng = np.random.default_rng(0)
    # > _MIN_BYTES so the chunked path actually engages
    big = rng.integers(-30000, 30000, 2_000_000).astype(np.int16)
    dev = jnp.asarray(big)
    assert np.array_equal(chunked_pull(dev), big)
    assert np.array_equal(chunked_pull(dev, 1_500_000), big[:1_500_000])
    # 2-D (stereo) arrays chunk along axis 0
    st = np.stack([big, big], axis=-1)
    assert np.array_equal(chunked_pull(jnp.asarray(st)), st)
    # small arrays take the single-pull path
    small = big[:1000]
    assert np.array_equal(chunked_pull(jnp.asarray(small)), small)
    # NumPy passthrough
    assert np.array_equal(chunked_pull(big, 10), big[:10])


def test_tape_stereo_device_export():
    audio = _test_audio()
    params = tape.TapeParams(
        sample_rate=48000, markers=[20000],
        section_speeds=[1.5, 0.75], section_reverse=[False, True],
        tape_age=40)
    frames = 30000
    prog = tape.build_tape_program(audio, params, frames)
    mono, _ = tape.tape_table_render(prog)
    prog2 = tape.build_tape_program(audio, params, frames)
    st, _ = tape.tape_table_render(prog2, stereo=True)
    assert st.shape == (frames, 2)
    assert np.array_equal(st[:, 0], mono)
    assert np.array_equal(st[:, 1], mono)
    # int16 stereo too
    prog3 = tape.build_tape_program(audio, params, frames)
    sti, _ = tape.tape_table_render(prog3, out_i16=True, stereo=True)
    assert sti.dtype == np.int16 and sti.shape == (frames, 2)
    assert np.array_equal(sti[:, 0], sti[:, 1])


def test_scrub_stereo_device_export():
    audio = _test_audio()
    cfg = scrub.ScrubConfig(sample_rate=48000, head_count=2)
    blocks = 20
    trace = scrub.scripted_gesture_trace(
        blocks, 48000, drag_events=[(0.1, 4.0, 0.2)], base_speed=0.4)
    mono = scrub.render_scrub(audio, cfg, trace)
    st = scrub.render_scrub(audio, cfg, trace, stereo=True)
    assert st.shape == (mono.shape[0], 2)
    assert np.array_equal(st[:, 0], mono)
    assert np.array_equal(st[:, 1], mono)


def test_grid_pcm16_public_path_and_bank_cache():
    rng = np.random.default_rng(3)
    rows = [{
        "pat": rng.uniform(-0.9, 0.9, 9000).astype(np.float32),
        "start_idx": 0, "loop": True,
        "resets": np.zeros(0, np.int32),
        "mod_src": -1, "win": 100, "a_q12": 0, "gain": 1.0,
    }]
    n_total = 30000
    f32 = grid._device_mixdown(n_total, rows)
    i16 = grid._device_mixdown(n_total, rows, pcm16=True)
    expect = np.clip(np.round(f32 * 32768.0), -32768, 32767).astype(np.int16)
    assert np.array_equal(i16, expect)
    # bank cache: same content hits the cached device array
    grid._BANK_CACHE = None
    grid._device_mixdown(n_total, rows)
    assert len(grid._BANK_CACHE) == 1
    dev1 = next(iter(grid._BANK_CACHE.values()))
    again = grid._device_mixdown(n_total, rows)
    assert len(grid._BANK_CACHE) == 1
    assert next(iter(grid._BANK_CACHE.values())) is dev1
    assert np.array_equal(again, f32)
