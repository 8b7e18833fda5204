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


def test_compute_metrics_cli(tmp_path):
    """tools/compute_metrics.py pairs the sampling pipeline's grid files and
    reports per-item + mean PSNR/SSIM (the authors' offline ssim.py/psnr.py
    workflow, /root/reference/.gitignore:23-31, committed here)."""
    import json
    import sys

    sys.path.insert(0, "tools")
    import compute_metrics

    from PIL import Image

    rng = np.random.default_rng(0)
    base = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    noisy = np.clip(
        base.astype(np.int32) + rng.integers(-12, 12, base.shape), 0, 255
    ).astype(np.uint8)
    for i in range(2):
        Image.fromarray(base).save(tmp_path / f"{i}_sample_ori.png")
        Image.fromarray(noisy).save(tmp_path / f"{i}_sample_gen.png")
    out = tmp_path / "report.json"
    rc = compute_metrics.main([str(tmp_path), "--json", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["n"] == 2
    assert 20 < report["psnr_db_mean"] < 45
    assert 0.0 < report["ssim_mean"] <= 1.0

    # two-directory pairing by basename
    gen_d, ref_d = tmp_path / "gen", tmp_path / "ref"
    gen_d.mkdir(), ref_d.mkdir()
    np.save(gen_d / "a.npy", np.zeros((1, 16, 16)))
    np.save(ref_d / "a.npy", np.zeros((1, 16, 16)) + 0.01)
    assert compute_metrics.main([str(gen_d), str(ref_d)]) == 0


def test_compute_gflops_cli(capsys):
    """tools/compute_gflops.py analytic path (the compute_gflot.py analog)."""
    import json
    import sys

    sys.path.insert(0, "tools")
    import compute_gflops

    rc = compute_gflops.main(["--model", "DiffMa-S/2", "--image-size", "64"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["tokens"] == 16 and report["depth"] == 4
    assert report["analytic_fwd_gflops_per_image"] > 0
