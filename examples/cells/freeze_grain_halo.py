"""Glitch family: spectral-freeze halo — one short noise burst is
analyzed once, then its magnitude frame is re-synthesized repeatedly
with fresh random phases, so a static spectrum shimmers without ever
moving.  Context-aware: the frozen spectrum tilts darker with grid
position (later cells ring lower)."""
import numpy as np


def generate(sr, dur, context=None):
    n = int(round(sr * dur))
    ci = int((context or {}).get("cell_index", 0))
    total = max(1, int((context or {}).get("cells_total", 8)))
    rng = np.random.default_rng(52000 + ci)

    nfft = 2048
    burst = rng.standard_normal(nfft).astype(np.float64)
    mag = np.abs(np.fft.rfft(burst * np.hanning(nfft)))
    # darken with position: -12 dB/oct extra tilt by the last cell
    f = np.linspace(1.0, nfft / 2, mag.size)
    tilt_db = -12.0 * (ci / total) * np.log2(f / f[0] + 1e-9) / 10.0
    mag = mag * 10.0 ** (tilt_db / 20.0)

    hop = nfft // 4
    out = np.zeros(n + nfft, np.float64)
    for start in range(0, n, hop):
        phase = rng.uniform(0, 2 * np.pi, mag.size)
        frame = np.fft.irfft(mag * np.exp(1j * phase), n=nfft)
        out[start:start + nfft] += frame * np.hanning(nfft)
    out = out[:n]
    env = np.minimum(1.0, np.arange(n) / (0.01 * sr + 1))
    env *= np.minimum(1.0, (n - np.arange(n)) / (0.05 * sr + 1))
    peak = np.max(np.abs(out)) + 1e-12
    return (0.4 * env * out / peak).astype(np.float32)
