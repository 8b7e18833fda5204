"""Distributed tests on the virtual 8-device CPU mesh: dp sharding, tp
sharding of the mixers, the multichip dryrun, and config compatibility."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow'

if jax.device_count() < 8:
    # DIFFMA_TEST_TPU=1 runs on the single real chip; the mesh tests need the
    # virtual 8-device CPU harness from conftest.
    pytest.skip("needs the 8-device virtual mesh", allow_module_level=True)

from diffma_tpu.diffusion import create_diffusion
from diffma_tpu.models.diffma import DiffMa
from diffma_tpu.parallel import make_mesh, param_partition_spec, shard_batch, shard_params
from diffma_tpu.train.state import TrainState, make_train_step
from diffma_tpu.train.train import make_loss_fn, synthetic_batch


def test_eight_virtual_devices():
    assert jax.device_count() == 8, "conftest must fake 8 CPU devices"


def test_mesh_shapes():
    m = make_mesh(tp=1)
    assert m.shape == {"dp": 8, "tp": 1}
    m = make_mesh(tp=2)
    assert m.shape == {"dp": 4, "tp": 2}
    m = make_mesh(dp=2, tp=4)
    assert m.shape == {"dp": 2, "tp": 4}


def test_param_partition_rules():
    spec = param_partition_spec("block_0/mamba/in_proj/kernel", (512, 2048), tp=2)
    assert spec == jax.sharding.PartitionSpec(None, "tp")
    spec = param_partition_spec("block_0/mamba/out_proj/kernel", (1024, 512), tp=2)
    assert spec == jax.sharding.PartitionSpec("tp", None)
    # non-divisible or non-mixer params stay replicated
    assert param_partition_spec("final_layer/linear/kernel", (512, 32), tp=3) == (
        jax.sharding.PartitionSpec()
    )
    assert param_partition_spec("block_0/adaLN/fc/kernel", (1024, 1536), tp=2) == (
        jax.sharding.PartitionSpec()
    )


@pytest.mark.parametrize("tp", [1, 2])
def test_sharded_train_step_matches_single_device(tp):
    """dp(+tp)-sharded training must produce the same loss and params as the
    unsharded computation (collectives inserted by XLA are exact)."""
    model = DiffMa(
        input_size=8, patch_size=2, depth=2, hidden_size=512,
        block_type="spiral", d_state=16,
    )
    diffusion = create_diffusion("")
    batch = synthetic_batch(jax.random.PRNGKey(0), 8, 8, 16)
    params = model.init(
        jax.random.PRNGKey(1), batch["z"], jnp.zeros(8, jnp.int32),
        batch["y"], batch["y2"], batch["w"],
    )["params"]
    opt = optax.adamw(1e-3, weight_decay=0.0)
    step = make_train_step(make_loss_fn(model, diffusion), opt)

    # single device
    s0 = TrainState.create(params, opt)
    s0, m0 = jax.jit(step)(s0, batch, jax.random.PRNGKey(2))

    # sharded
    mesh = make_mesh(tp=tp)
    with mesh:
        s1 = TrainState.create(shard_params(params, mesh), opt)
        sb = shard_batch(jax.tree.map(np.asarray, batch), mesh)
        s1, m1 = jax.jit(step, donate_argnums=(0,))(s1, sb, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=2e-4)
    a = jax.tree.leaves(s0.params)
    b = jax.tree.leaves(s1.params)
    worst = max(
        float(jnp.abs(x - jax.device_get(y)).max() / (jnp.abs(x).max() + 1e-9))
        for x, y in zip(a, b)
    )
    assert worst < 5e-3, worst


def test_dryrun_multichip():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_reference_configs_load_unmodified():
    ref_cfg = "/root/reference/config/brain.yaml"
    if not os.path.isfile(ref_cfg):
        pytest.skip("reference configs not mounted")
    from diffma_tpu.utils.config import load_config

    cfg = load_config(ref_cfg)
    assert cfg.model == "DiffMa-L/2"
    assert cfg.image_size == 224
    assert cfg.global_batch_size == 8
    assert cfg.dt_rank == 16 and cfg.d_state == 16
    assert cfg.sample_num_steps == 250
    assert cfg.load_ckpt_type == "ema"
