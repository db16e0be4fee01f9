"""Exact-length DFT kernels vs np.fft at arbitrary n (the reference's
grain transforms run at the true grain length, main_v2.py:39-163)."""
import numpy as np
import pytest

from audio_suite_tpu.ops import exact_dft


def _roundtrip_err(fwd, inv, n, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((batch, n)).astype(np.float32)
    X = np.asarray(fwd(x, n))
    ref_X = np.fft.rfft(x.astype(np.float64))
    fwd_err = np.abs(X - ref_X).max() / max(1e-12, np.abs(ref_X).max())
    y = np.asarray(inv(X.astype(np.complex64), n))
    ref_y = np.fft.irfft(ref_X, n=n)
    inv_err = np.abs(y - ref_y).max()
    return fwd_err, inv_err


FOUR_NS = [1500, 19200, 37500, 960, 4800, 2048 * 3, 1155, 44100]
BLUE_NS = [1499, 4099, 65537, 2017, 9973]


@pytest.mark.parametrize("n", FOUR_NS)
def test_four_step_exact(n):
    assert exact_dft.factor_balanced(n) is not None
    fe, ie = _roundtrip_err(exact_dft._rfft_four, exact_dft._irfft_four, n)
    assert fe < 5e-6, f"n={n} fwd rel err {fe}"
    assert ie < 5e-5, f"n={n} inv err {ie}"


@pytest.mark.parametrize("n", BLUE_NS)
def test_bluestein_exact(n):
    fe, ie = _roundtrip_err(exact_dft._rfft_bluestein,
                            exact_dft._irfft_bluestein, n)
    assert fe < 2e-5, f"n={n} fwd rel err {fe}"
    assert ie < 2e-4, f"n={n} inv err {ie}"


@pytest.mark.parametrize("n", [15, 16, 17, 63, 64, 255, 1024, 1500])
def test_public_api_any_n(n):
    """rfft_n/irfft_n dispatch (xla path on CPU) matches np.fft at any n,
    including odd n and inputs longer than n (padded grain buffers)."""
    rng = np.random.default_rng(n)
    L = n + 37
    x = rng.standard_normal((3, L)).astype(np.float32)
    X = np.asarray(exact_dft.rfft_n(x, n))
    ref = np.fft.rfft(x[..., :n].astype(np.float64))
    assert np.abs(X - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())
    y = np.asarray(exact_dft.irfft_n(X.astype(np.complex64), n, out_len=L))
    assert y.shape == (3, L)
    ref_y = np.fft.irfft(ref, n=n)
    assert np.abs(y[..., :n] - ref_y).max() < 2e-5
    assert np.abs(y[..., n:]).max() == 0.0


@pytest.mark.parametrize("n", [945, 1001, 4725])  # odd composite
def test_four_step_odd_n(n):
    if exact_dft.factor_balanced(n) is None:
        pytest.skip("not factorable")
    fe, ie = _roundtrip_err(exact_dft._rfft_four, exact_dft._irfft_four, n)
    assert fe < 5e-6 and ie < 5e-5


def test_plan_dispatch():
    assert exact_dft.plan(1500, backend="cpu") == "xla"
    assert exact_dft.plan(19200, backend="tpu") == "four"
    assert exact_dft.plan(32768, backend="tpu") == "pow2"
    assert exact_dft.plan(2048, backend="tpu") == "xla"   # small pow2
    assert exact_dft.plan(65537, backend="tpu") == "bluestein"
    assert exact_dft.plan(100, backend="tpu") == "four"       # 10*10
    assert exact_dft.plan(97, backend="tpu") == "bluestein"   # prime


def test_bluestein_m_bound():
    for n in (1499, 2017):
        M = exact_dft._bluestein_consts(n)[0]
        assert M >= 2 * n - 1 and (M & (M - 1)) == 0
