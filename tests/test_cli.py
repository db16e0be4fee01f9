"""CLI integration: drive `python -m audio_suite_tpu.cli` as a subprocess
(the real module entry point users run)."""
import os
import subprocess
import sys

import numpy as np

from audio_suite_tpu.utils import io as audio_io

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=REPO):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    return subprocess.run([sys.executable, "-m", "audio_suite_tpu.cli",
                           *args], capture_output=True, text=True, env=env,
                          cwd=cwd, timeout=300)


def test_cli_tape_and_patternlab(tmp_path):
    sr = 8000
    t = np.arange(sr) / sr
    wav = str(tmp_path / "in.wav")
    audio_io.write_wav(wav, (0.5 * np.sin(2 * np.pi * 220 * t))
                       .astype(np.float32), sr)

    r = _run(["tape", wav, "-o", str(tmp_path / "t.wav"),
              "--markers", "0.4", "--speeds", "1.0,2.0"])
    assert r.returncode == 0, r.stderr
    y, sr2 = audio_io.read_wav(str(tmp_path / "t.wav"))
    assert sr2 == sr and len(y) > 0

    r = _run(["patternlab", "-o", str(tmp_path / "p.wav"),
              "--generator", "Glass Cells", "--seconds", "1"])
    assert r.returncode == 0, r.stderr
    y, _ = audio_io.read_wav(str(tmp_path / "p.wav"))
    assert np.isfinite(y).all()

    r = _run(["forestfire", "--steps", "30", "--seed", "2"])
    assert r.returncode == 0, r.stderr
    assert "OSC events" in r.stdout
