"""Checkpoint round-trips: Orbax save/restore, torch-pickle interop,
find_model/load_diffma_params dispatch (reference layout train.py:290-303)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffma_tpu.train.checkpoints import (
    find_model,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)


def _tree():
    return {
        "model": {
            "w": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": np.zeros(3, np.float32),
        },
        "ema": {"w": np.ones((2, 3), np.float32), "b": np.full(3, 2.0, np.float32)},
        "opt": {"count": np.int32(7)},
    }


def test_orbax_roundtrip(tmp_path):
    d = str(tmp_path / "ckpts")
    tree = _tree()
    path = save_checkpoint(d, 120, {**tree, "args": {"model": "DiffMa-S/2", "lr": 1e-4}})
    assert os.path.isdir(path)
    assert latest_step(d) == 120

    restored = restore_checkpoint(d, 120)
    np.testing.assert_array_equal(restored["model"]["w"], tree["model"]["w"])
    np.testing.assert_array_equal(restored["ema"]["b"], tree["ema"]["b"])
    # args sidecar
    import json

    with open(path + ".args.json") as f:
        args = json.load(f)
    assert args["model"] == "DiffMa-S/2"


def test_find_model_orbax_and_torch(tmp_path):
    d = str(tmp_path / "ckpts")
    tree = _tree()
    path = save_checkpoint(d, 7, tree)
    ema = find_model(path, "ema")
    np.testing.assert_array_equal(ema["w"], tree["ema"]["w"])
    model = find_model(path, "model")
    np.testing.assert_array_equal(model["b"], tree["model"]["b"])

    torch = pytest.importorskip("torch")
    tpath = str(tmp_path / "ref.pt")
    torch.save(
        {
            "model": {"fc.weight": torch.arange(4.0).reshape(2, 2)},
            "ema": {"fc.weight": torch.ones(2, 2)},
        },
        tpath,
    )
    got = find_model(tpath, "ema")
    np.testing.assert_array_equal(got["fc.weight"], np.ones((2, 2), np.float32))


@pytest.mark.slow
def test_load_diffma_params_converts_torch(tmp_path):
    torch = pytest.importorskip("torch")
    from diffma_tpu.models.diffma import DiffMa
    from diffma_tpu.train.checkpoints import load_diffma_params

    d, n, depth = 64, 8, 1
    model = DiffMa(
        input_size=8, patch_size=2, depth=depth, hidden_size=d,
        block_type="zig", d_state=n, scan_impl="ref",
    )
    # build a reference-layout state dict with the right shapes
    import math

    r = math.ceil(d / 16)
    d_in = 2 * d
    sd = {
        "x_embedder.proj.weight": torch.zeros(d, 4, 2, 2),
        "x_embedder.proj.bias": torch.zeros(d),
        "t_embedder.mlp.0.weight": torch.zeros(d, 256),
        "t_embedder.mlp.0.bias": torch.zeros(d),
        "t_embedder.mlp.2.weight": torch.zeros(d, d),
        "t_embedder.mlp.2.bias": torch.zeros(d),
        "blocks.0.norm1.weight": torch.ones(d),
        "blocks.0.norm1.bias": torch.zeros(d),
        "blocks.0.adaLN_modulation.1.weight": torch.zeros(3 * d, 2 * d),
        "blocks.0.adaLN_modulation.1.bias": torch.zeros(3 * d),
        "blocks.0.mamba.in_proj.weight": torch.zeros(2 * d_in, d),
        "blocks.0.mamba.conv1d.weight": torch.zeros(d_in, 1, 4),
        "blocks.0.mamba.conv1d.bias": torch.zeros(d_in),
        "blocks.0.mamba.x_proj.weight": torch.zeros(r + 2 * n, d_in),
        "blocks.0.mamba.dt_proj.weight": torch.zeros(d_in, r),
        "blocks.0.mamba.dt_proj.bias": torch.zeros(d_in),
        "blocks.0.mamba.A_log": torch.zeros(d_in, n),
        "blocks.0.mamba.D": torch.ones(d_in),
        "blocks.0.mamba.out_proj.weight": torch.zeros(d, d_in),
        "final_layer.adaLN_modulation.1.weight": torch.zeros(2 * d, 2 * d),
        "final_layer.adaLN_modulation.1.bias": torch.zeros(2 * d),
        "final_layer.linear.weight": torch.zeros(2 * 2 * 8, d),
        "final_layer.linear.bias": torch.zeros(2 * 2 * 8),
    }
    tpath = str(tmp_path / "diffma.pt")
    torch.save({"ema": sd}, tpath)

    params = load_diffma_params(tpath, model, "ema")
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    args = (
        jax.random.normal(ks[0], (2, 4, 8, 8)),
        jnp.array([1, 2], jnp.int32),
        jax.random.normal(ks[1], (2, d)),
        jax.random.normal(ks[2], (2, 16, d)),
        jax.nn.sigmoid(jax.random.normal(ks[3], (2, 16, 1))),
    )
    ref_shapes = jax.tree.map(
        lambda x: tuple(x.shape), model.init(ks[4], *args)["params"]
    )
    got_shapes = jax.tree.map(lambda x: tuple(np.asarray(x).shape), params)
    assert got_shapes == ref_shapes
