"""End-to-end training pipeline tests (synthetic data, CPU 8-device mesh)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow'

from diffma_tpu.diffusion import create_diffusion
from diffma_tpu.models.diffma import DiffMa
from diffma_tpu.train.state import TrainState, make_train_step, update_ema
from diffma_tpu.train.train import main, make_loss_fn, synthetic_batch
from diffma_tpu.utils.config import Config


def _tiny_cfg(tmp_path, **over):
    cfg = Config(
        {
            "epochs": 1,
            "log_every": 2,
            "ckpt_every": 4,
            "accumulation_steps": 1,
            "lr": 1e-4,
            "results_dir": str(tmp_path / "results"),
            "model": "DiffMa-S/2",
            "image_size": 64,  # 8x8 latents
            "global_batch_size": 8,
            "global_seed": 0,
            "dt_rank": 16,
            "d_state": 4,
            "synthetic_data": True,
            "synthetic_dataset_size": 32,
            "max_steps": 4,
        }
    )
    cfg.update(over)
    return cfg


def test_train_step_updates_and_ema():
    model = DiffMa(input_size=8, patch_size=2, depth=2, block_type="zig", d_state=4)
    diffusion = create_diffusion("")
    batch = synthetic_batch(jax.random.PRNGKey(0), 4, 8, 16)
    params = model.init(
        jax.random.PRNGKey(1), batch["z"], jnp.zeros(4, jnp.int32),
        batch["y"], batch["y2"], batch["w"],
    )["params"]
    opt = optax.adamw(1e-3, weight_decay=0.0)
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(make_loss_fn(model, diffusion), opt))

    before = jax.tree.map(jnp.copy, state.params)
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert bool(metrics["finite"])
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    moved = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state.params))
    )
    assert moved > 0  # params moved
    # EMA is a 0.999 lerp between old params and new params
    ema_gap = sum(
        float(jnp.abs(e - p).sum())
        for e, p in zip(jax.tree.leaves(state.ema_params), jax.tree.leaves(state.params))
    )
    assert ema_gap > 0


def test_nan_loss_skips_update():
    model = DiffMa(input_size=8, patch_size=2, depth=1, block_type="zig", d_state=4)
    diffusion = create_diffusion("")
    batch = synthetic_batch(jax.random.PRNGKey(0), 2, 8, 16)
    params = model.init(
        jax.random.PRNGKey(1), batch["z"], jnp.zeros(2, jnp.int32),
        batch["y"], batch["y2"], batch["w"],
    )["params"]
    opt = optax.adamw(1e-3, weight_decay=0.0)
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(make_loss_fn(model, diffusion), opt))

    bad = dict(batch)
    bad["z"] = batch["z"].at[0, 0, 0, 0].set(jnp.nan)
    new_state, metrics = step(state, bad, jax.random.PRNGKey(2))
    assert not bool(metrics["finite"])
    assert int(new_state.step) == 0  # skipped entirely (train.py:254-256)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(new_state.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )


def test_accumulation_semantics():
    """Optimizer fires when the PRE-increment counter % k == 0
    (train.py:261-265): with k=2, updates happen on iterations 1, 3, 5, ..."""
    model = DiffMa(input_size=8, patch_size=2, depth=1, block_type="zig", d_state=4)
    diffusion = create_diffusion("")
    batch = synthetic_batch(jax.random.PRNGKey(0), 2, 8, 16)
    params = model.init(
        jax.random.PRNGKey(1), batch["z"], jnp.zeros(2, jnp.int32),
        batch["y"], batch["y2"], batch["w"],
    )["params"]
    opt = optax.adamw(1e-3, weight_decay=0.0)
    state = TrainState.create(params, opt)
    step = jax.jit(
        make_train_step(make_loss_fn(model, diffusion), opt, accumulation_steps=2)
    )
    def total(tree):
        return sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(tree))

    def delta(a, b):
        return sum(
            float(jnp.abs(x - y).sum())
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    p0 = jax.tree.map(jnp.copy, state.params)
    state, _ = step(state, batch, jax.random.PRNGKey(2))  # step 0: update fires
    p1 = jax.tree.map(jnp.copy, state.params)
    assert delta(p0, p1) > 0
    state, _ = step(state, batch, jax.random.PRNGKey(3))  # step 1: accumulate only
    assert delta(p1, state.params) == 0
    assert total(state.accum_grads) > 0


def test_update_ema_matches_reference_formula():
    ema = {"w": jnp.ones((3,))}
    params = {"w": jnp.zeros((3,))}
    out = update_ema(ema, params, decay=0.999)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.999)


def test_full_pipeline_synthetic(tmp_path):
    state = main(_tiny_cfg(tmp_path))
    assert state is not None
    assert int(state.step) == 4
    ckpts = list((tmp_path / "results").glob("*/checkpoints/*"))
    assert ckpts, "checkpoint should have been written at step 4"


def test_full_pipeline_mamba2(tmp_path):
    state = main(_tiny_cfg(tmp_path, use_mamba2=True, max_steps=2, ckpt_every=100))
    assert int(state.step) == 2


def test_resume_from_checkpoint_matches_uninterrupted(tmp_path):
    """save -> stop -> resume_from -> continue == an uninterrupted run
    (params, EMA and optimizer state restored with full fidelity; the
    reference's restart reloads model/ema only, train.py:137-151)."""

    def delta(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    main(_tiny_cfg(tmp_path, max_steps=2, ckpt_every=2))
    ckpt_dirs = list((tmp_path / "results").glob("*/checkpoints"))
    assert len(ckpt_dirs) == 1
    resumed = main(
        _tiny_cfg(
            tmp_path, max_steps=4, ckpt_every=100,
            resume_from=str(ckpt_dirs[0]),
        )
    )
    assert int(resumed.step) == 4
    full = main(_tiny_cfg(tmp_path, max_steps=4, ckpt_every=100))
    assert delta(resumed.params, full.params) < 1e-6
    assert delta(resumed.ema_params, full.ema_params) < 1e-6
