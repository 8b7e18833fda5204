"""Native C++ loader parity: builds the .so and compares against the pure
Python (PIL) path on synthetic .npy triplets."""

import os

import numpy as np
import pytest

from diffma_tpu.data.native import NativeTripletLoader, native_available
from diffma_tpu.data.npy_dataset import NpyDataset, transform_train

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader could not be built"
)


@pytest.fixture()
def triplet_dirs(tmp_path):
    rng = np.random.default_rng(0)
    dirs = [tmp_path / n for n in ("ct", "mask", "mri")]
    for d in dirs:
        d.mkdir()
    for i in range(6):
        name = f"slice_{i:03d}.npy"
        np.save(dirs[0] / name, rng.normal(size=(180, 190)).astype(np.float32))
        np.save(
            dirs[1] / name,
            (rng.random((180, 190)) > 0.5).astype(np.float32) * 2 - 1,
        )
        np.save(dirs[2] / name, rng.normal(size=(180, 190)).astype(np.float64))
    return [str(d) for d in dirs]


def test_native_matches_python_path(triplet_dirs):
    size = 64
    native = NativeTripletLoader(*triplet_dirs, size=size)
    python = NpyDataset(
        *triplet_dirs, transform=lambda a, b, c: transform_train(a, b, c, (size, size))
    )
    idx = [0, 3, 5]
    ct_n, mask_n, mri_n = native.load_batch(idx)
    for row, i in enumerate(idx):
        ct_p, mask_p, mri_p = python[i]
        np.testing.assert_allclose(ct_n[row], ct_p, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(mask_n[row], mask_p, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(mri_n[row], mri_p, rtol=1e-5, atol=1e-5)


def test_native_upscale_matches(triplet_dirs):
    native = NativeTripletLoader(*triplet_dirs, size=256)
    python = NpyDataset(
        *triplet_dirs,
        transform=lambda a, b, c: transform_train(a, b, c, (256, 256)),
    )
    ct_n, mask_n, _ = native.load_batch([1])
    ct_p, mask_p, _ = python[1]
    np.testing.assert_allclose(ct_n[0], ct_p, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(mask_n[0], mask_p, rtol=1e-5, atol=1e-6)


def test_native_missing_file_raises(triplet_dirs):
    native = NativeTripletLoader(*triplet_dirs, size=32)
    native.images.append("missing.npy")
    with pytest.raises(IOError):
        native.load_batch([len(native.images) - 1])
