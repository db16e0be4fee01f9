"""bench.py smoke: the driver runs bench.py at round end to score the
framework; it reaches into engine seams (prepared dispatches, fused
chains, program builders) that a refactor could silently break.  This
runs the ENTIRE harness in BENCH_SMOKE mode (same code paths, CI-scale
sizes) on CPU and fails on any config failure."""
import importlib
import io
import json
import os
import sys

import numpy as np


def test_bench_harness_smoke(capsys, monkeypatch):
    monkeypatch.setenv("BENCH_SMOKE", "1")
    try:
        import bench
        bench = importlib.reload(bench)   # re-read _SMOKE under the env
        assert bench._SMOKE
        bench.main()
    finally:
        # drop the smoke-mode module so any later import re-evaluates
        # _SMOKE (and the CI-scale configs) under the restored env
        sys.modules.pop("bench", None)

    line = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(line)
    assert "failures" not in rep, rep.get("failures")
    assert rep["metric"] == "rtf_geomean" and rep["value"] > 0
    for cfg in ("tape", "scrub", "microsound", "patternlab",
                "grid_forestfire"):
        assert rep[f"rtf_{cfg}"] > 0, cfg
    # the compute-protocol extras must exist too (the seams most likely
    # to break under refactors)
    for k in ("rtf_tape_compute", "rtf_scrub_compute",
              "rtf_microsound_compute", "rtf_patternlab_compute",
              "rtf_grid_compute", "rtf_tape_param_tweak",
              "null_loop_latency_ms"):
        assert k in rep and np.isfinite(rep[k]), k
