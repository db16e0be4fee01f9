"""Forest Fire CA + rules/OSC: bit-exact device-vs-oracle trajectories,
threshold rule semantics (hysteresis/edges/cooldown), OSC wire format per
the Pd receiver contract, UDP roundtrip, brush edits."""
import socket

import numpy as np

from audio_suite_tpu.models import forestfire as ff
from audio_suite_tpu.events import rules as R
from oracles.forestfire_ref import simulate_np

SMALL = ff.ModelParams(w=64, h=48, rain_chance=0.05, lightning_rate=1e-4)


def test_init_reference_exact():
    st = ff.init_state(SMALL, seed=3)
    assert st["state"].shape == (48, 64)
    frac_trees = float((st["state"] == ff.TREE).mean())
    assert 0.5 < frac_trees < 0.72
    assert st["moisture"].min() >= 0.0 and st["moisture"].max() <= 1.0
    assert st["elev"].min() >= 0.0 and st["elev"].max() <= 1.0
    # fuel only on trees, in [0.75, 1]
    trees = st["state"] == ff.TREE
    assert st["fuel"][~trees].max() == 0.0
    assert st["fuel"][trees].min() >= 0.75


def test_sim_bit_exact_vs_oracle():
    model = ff.ForestFireModel(SMALL, seed=3)
    model.ignite_at(30, 20, radius=3)
    carry0 = {k: v.copy() if isinstance(v, np.ndarray) else v
              for k, v in model._np.items()}

    stats_dev = model.simulate(80)
    carry_ref, stats_ref = simulate_np(carry0, 80, SMALL, seed=3)

    assert np.array_equal(stats_dev, stats_ref), (
        stats_dev[:5], stats_ref[:5])
    for k in ("state", "fuel", "moisture", "age"):
        assert np.array_equal(model._np[k], carry_ref[k]), k


def test_sim_resume_continuity():
    """two simulate() calls == one long call (step counter threads through
    the noise streams)."""
    a = ff.ForestFireModel(SMALL, seed=7)
    a.ignite_at(10, 10, radius=2)
    s1 = a.simulate(30)
    s2 = a.simulate(30)
    b = ff.ForestFireModel(SMALL, seed=7)
    b.ignite_at(10, 10, radius=2)
    s = b.simulate(60)
    assert np.array_equal(np.concatenate([s1, s2]), s)


def test_fire_actually_spreads_and_stats():
    model = ff.ForestFireModel(SMALL, seed=1)
    model.ignite_at(32, 24, radius=4)
    stats = model.simulate(40)
    burning = stats[:, 2]
    assert burning[0] > 0
    assert int(stats[:, 5].sum()) > 0          # ignitions happened
    d = model.get_stats()
    assert set(d) == set(ff.STAT_KEYS)
    assert d["trees"] + d["burning"] + d["ash"] + d["empty"] \
        == SMALL.w * SMALL.h


def test_brush_edits():
    model = ff.ForestFireModel(SMALL, seed=2)
    model.clear_at(5, 5, radius=3)
    yy, xx = model._brush(5, 5, 3)
    assert (model._np["state"][yy, xx] == ff.EMPTY).all()
    model.set_tree_at(5, 5, radius=3)
    assert (model._np["state"][yy, xx] == ff.TREE).all()
    model.ignite_at(5, 5, radius=1)
    assert (model._np["state"] == ff.FIRE).any()
    rgb = model.render_rgb()
    assert rgb.shape == (SMALL.h, SMALL.w, 3) and rgb.dtype == np.uint8


# ---------------------------------------------------------------------------
# rules + OSC
# ---------------------------------------------------------------------------

class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_rule_edges_and_hysteresis():
    clock = FakeClock()
    eng = R.WatchEngine(now_fn=clock)
    eng.set_rules([R.ThresholdRule(metric_key="burning", op=">",
                                   threshold=10.0, hysteresis=2.0,
                                   cooldown_s=0.0, edge="rising",
                                   osc_address="/fire/burning_hi")])
    rec = R.OSCRecorder()
    for v in (5, 11, 13, 9, 7, 13):
        clock.t += 1.0
        eng.update({"burning": v}, rec.send)
    # activation needs > threshold+h = 12 (11 no, 13 yes); deactivation
    # below threshold-h = 8 (9 stays active, 7 deactivates); re-rise at 13
    assert [m[1][1] for m in rec.messages] == [13.0, 13.0]
    assert all(m[1][0] == 1 for m in rec.messages)


def test_rule_cooldown_and_level():
    clock = FakeClock()
    eng = R.WatchEngine(now_fn=clock)
    eng.set_rules([R.ThresholdRule(metric_key="x", op=">", threshold=0.5,
                                   cooldown_s=1.0, edge="level",
                                   osc_address="/x")])
    rec = R.OSCRecorder()
    for _ in range(8):
        clock.t += 0.3
        eng.update({"x": 1.0}, rec.send)
    # level edge fires every update; cooldown (>=1s since last send, which
    # starts at 0) gates to t=1.2 and t=2.4 only
    assert len(rec.messages) == 2


def test_rule_band_and_falling():
    clock = FakeClock()
    eng = R.WatchEngine(now_fn=clock)
    eng.set_rules([R.ThresholdRule(metric_key="x", op="band", threshold=10,
                                   threshold_hi=20, cooldown_s=0.0,
                                   edge="falling", osc_address="/b")])
    rec = R.OSCRecorder()
    for v in (15, 25, 15, 5):
        clock.t += 1
        eng.update({"x": v}, rec.send)
    assert [m[1][1] for m in rec.messages] == [25.0, 5.0]
    assert all(m[1][0] == 0 for m in rec.messages)


def test_osc_wire_format_pd_contract():
    """Pd contract: /fire/<name> with payload [state(int32), value(f32)]."""
    pkt = R.encode_message("/fire/burning_hi", 1, 42.0)
    # address padded to 4-byte boundary with NULs
    assert pkt.startswith(b"/fire/burning_hi\x00")
    addr_len = ((len("/fire/burning_hi") + 1 + 3) // 4) * 4
    tags = pkt[addr_len:addr_len + 4]
    assert tags == b",if\x00"
    import struct
    state, value = struct.unpack(">if", pkt[addr_len + 4:addr_len + 12])
    assert state == 1 and value == 42.0
    # decode inverse
    addr, args = R.decode_message(pkt)
    assert addr == "/fire/burning_hi" and args == [1, 42.0]


def test_osc_udp_roundtrip():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    sender = R.OSCSender(R.OSCConfig(host="127.0.0.1", port=port))
    sender.send("/fire/rain", 1, 3.0)
    data, _ = rx.recvfrom(4096)
    addr, args = R.decode_message(data)
    assert addr == "/fire/rain" and args == [1, 3.0]
    sender.cfg.enabled = False
    sender.send("/fire/rain", 0, 0.0)   # gated
    sender.close()
    rx.close()


def test_ca_to_osc_event_stream():
    """End-to-end config-5 path: device sim stats stream -> threshold rules
    -> recorded OSC golden stream (deterministic)."""
    model = ff.ForestFireModel(SMALL, seed=5)
    model.ignite_at(32, 24, radius=5)
    stats = model.simulate(60)
    rows = ff.stats_rows_to_dicts(stats)

    clock = FakeClock()
    eng = R.WatchEngine(now_fn=clock)
    eng.set_rules([
        R.ThresholdRule(metric_key="burning", op=">", threshold=30,
                        edge="rising", cooldown_s=0.0,
                        osc_address="/fire/burning_hi"),
        R.ThresholdRule(metric_key="ignitions", op=">", threshold=8,
                        edge="rising", cooldown_s=0.0,
                        osc_address="/fire/ignitions_spike"),
        R.ThresholdRule(metric_key="rain", op=">", threshold=0.5,
                        edge="rising", cooldown_s=0.0,
                        osc_address="/fire/rain"),
    ])
    rec = R.OSCRecorder()
    for row in rows:
        clock.t += 1 / 30.0
        eng.update(row, rec.send)

    assert len(rec.messages) > 0
    addrs = {m[0] for m in rec.messages}
    assert "/fire/burning_hi" in addrs
    # every packet decodes and follows the [state, value] convention
    for pkt, (addr, args) in zip(rec.packets, rec.messages):
        daddr, dargs = R.decode_message(pkt)
        assert daddr == addr
        assert dargs[0] in (0, 1)

    # determinism: same run -> identical byte stream
    model2 = ff.ForestFireModel(SMALL, seed=5)
    model2.ignite_at(32, 24, radius=5)
    stats2 = model2.simulate(60)
    assert np.array_equal(stats, stats2)


def test_brush_edits_after_simulate():
    """The host state mirror must stay writable after device steps
    (np.asarray of a device buffer is a read-only view)."""
    from audio_suite_tpu.models import forestfire as ff

    model = ff.ForestFireModel(ff.ModelParams(w=32, h=24), seed=3)
    model.simulate(4)
    model.set_tree_at(5, 5, radius=2)
    model.ignite_at(6, 6, radius=1)
    model.clear_at(1, 1, radius=1)
    stats = model.simulate(3)
    assert stats.shape == (3, 8)
