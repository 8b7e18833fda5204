"""Quality-metric harness tests (utils/metrics.py)."""

import numpy as np
import pytest

from diffma_tpu.utils.metrics import psnr, quality_report, ssim


def _img(seed=0, shape=(2, 3, 32, 32)):
    return np.random.default_rng(seed).uniform(-1, 1, shape)


def test_psnr_identity_and_known_value():
    x = _img()
    assert psnr(x, x) == float("inf")
    # constant 0.1 offset: mse = 0.01, psnr = 10*log10(2^2 / 0.01)
    got = psnr(x, x + 0.1, data_range=2.0)
    np.testing.assert_allclose(got, 10 * np.log10(4.0 / 0.01), rtol=1e-6)


def test_ssim_identity_is_one():
    x = _img(1)
    np.testing.assert_allclose(ssim(x, x), 1.0, atol=1e-12)


def test_ssim_monotone_under_noise():
    x = _img(2)
    rng = np.random.default_rng(3)
    small = ssim(x, x + 0.05 * rng.standard_normal(x.shape))
    large = ssim(x, x + 0.5 * rng.standard_normal(x.shape))
    assert 1.0 > small > large > -1.0


def test_ssim_matches_direct_windowed_formula():
    """Cross-check the separable implementation against a literal dense
    Gaussian-window computation on a single small image."""
    rng = np.random.default_rng(4)
    a = rng.uniform(-1, 1, (16, 16))
    b = np.clip(a + 0.1 * rng.standard_normal((16, 16)), -1, 1)
    # dense window
    g1 = np.exp(-((np.arange(11) - 5.0) ** 2) / (2 * 1.5**2))
    g1 /= g1.sum()
    win = np.outer(g1, g1)
    c1, c2 = (0.01 * 2) ** 2, (0.03 * 2) ** 2
    vals = []
    for i in range(16 - 10):
        for j in range(16 - 10):
            pa = a[i : i + 11, j : j + 11]
            pb = b[i : i + 11, j : j + 11]
            mua, mub = (win * pa).sum(), (win * pb).sum()
            saa = (win * pa * pa).sum() - mua**2
            sbb = (win * pb * pb).sum() - mub**2
            sab = (win * pa * pb).sum() - mua * mub
            vals.append(
                ((2 * mua * mub + c1) * (2 * sab + c2))
                / ((mua**2 + mub**2 + c1) * (saa + sbb + c2))
            )
    np.testing.assert_allclose(ssim(a, b), np.mean(vals), rtol=1e-10)


def test_quality_report_shape_check():
    x = _img(5)
    r = quality_report(x, x * 0.9)
    assert set(r) == {"psnr_db", "ssim"}
    with pytest.raises(ValueError):
        ssim(x, x[..., :16])
