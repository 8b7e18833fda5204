"""Smoke tests for the sampling and embedder pipelines (synthetic, tiny)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow'

import jax
import jax.numpy as jnp

from diffma_tpu.train.sample import main as sample_main, save_image_grid
from diffma_tpu.train.train_embedder import info_nce_loss_b, main as embedder_main
from diffma_tpu.utils.config import Config


def test_save_image_grid(tmp_path):
    imgs = np.random.default_rng(0).normal(size=(5, 3, 16, 16)).astype(np.float32)
    path = str(tmp_path / "grid.png")
    save_image_grid(imgs, path, nrow=4)
    from PIL import Image

    im = Image.open(path)
    assert im.size[0] > 16 and im.size[1] > 16


def test_info_nce_loss():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 8))
    loss = info_nce_loss_b(x)
    assert np.isfinite(float(loss))
    # identical rows => maximal confusion: loss ~ log(B)
    same = jnp.tile(x[:1], (4, 1, 1))
    loss_same = float(info_nce_loss_b(same))
    np.testing.assert_allclose(loss_same, np.log(4), rtol=1e-3)


def test_sample_pipeline_synthetic(tmp_path):
    cfg = Config(
        {
            "model": "DiffMa-S/2",
            "image_size": 64,
            "d_state": 4,
            "dt_rank": 16,
            "sample_num_steps": 4,
            "sample_global_batch_size": 2,
            "sample_num_batches": 1,
            "synthetic_data": True,
            "synthetic_dataset_size": 4,
            "save_dir": str(tmp_path / "samples"),
            "seed": 0,
        }
    )
    results = sample_main(cfg)
    assert len(results) == 1
    assert results[0].shape == (2, 3, 64, 64)
    assert np.isfinite(results[0]).all()
    assert (tmp_path / "samples" / "1_sample_gen.png").exists()


def test_embedder_pipeline_synthetic(tmp_path):
    cfg = Config(
        {
            "image_size": 64,
            "embedder_patch_size": 2,
            "embedder_embed_dim": 64,
            "embedder_global_batch_size": 4,
            "embedder_global_seed": 0,
            "embedder_epoch": 1,
            "embedder_ckpt_every": 1000,
            "embedder_results_dir": str(tmp_path / "emb"),
            "synthetic_data": True,
            "synthetic_dataset_size": 8,
            "log_every": 1,
            "max_steps": 2,
        }
    )
    state = embedder_main(cfg)
    assert int(state.step) == 2
