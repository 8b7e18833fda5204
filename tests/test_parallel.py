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
    assert m.shape == {"dp": 8, "tp": 1, "sp": 1}
    m = make_mesh(tp=2)
    assert m.shape == {"dp": 4, "tp": 2, "sp": 1}
    m = make_mesh(dp=2, tp=2, sp=2)
    assert m.shape == {"dp": 2, "tp": 2, "sp": 2}


def test_params_replicated():
    # TP/SP are module-managed (shard_map slices replicated weights locally);
    # parameters carry no tp sharding.
    assert param_partition_spec("block_0/mamba/in_proj/kernel", (512, 2048), 2) == (
        jax.sharding.PartitionSpec()
    )


@pytest.mark.parametrize("tp,use_mamba2", [(1, False), (2, False), (2, True)])
def test_sharded_train_step_matches_single_device(tp, use_mamba2):
    """dp(+tp)-sharded training must produce the same loss and params as the
    unsharded computation.  tp>1 exercises the module-managed shard_map TP
    path (activations sharded through conv/scan/gate, psum at out_proj)."""
    mesh = make_mesh(tp=tp)
    model = DiffMa(
        input_size=8, patch_size=2, depth=2, hidden_size=512,
        block_type="spiral", d_state=16, use_mamba2=use_mamba2,
        mesh=mesh if tp > 1 else None, tp_axis="tp" if tp > 1 else None,
    )
    model0 = DiffMa(
        input_size=8, patch_size=2, depth=2, hidden_size=512,
        block_type="spiral", d_state=16, use_mamba2=use_mamba2,
    )
    diffusion = create_diffusion("")
    batch = synthetic_batch(jax.random.PRNGKey(0), 8, 8, 16)
    params = model0.init(
        jax.random.PRNGKey(1), batch["z"], jnp.zeros(8, jnp.int32),
        batch["y"], batch["y2"], batch["w"],
    )["params"]
    opt = optax.adamw(1e-3, weight_decay=0.0)

    # single device
    s0 = TrainState.create(params, opt)
    s0, m0 = jax.jit(make_train_step(make_loss_fn(model0, diffusion), opt))(
        s0, batch, jax.random.PRNGKey(2)
    )

    # sharded
    step = make_train_step(make_loss_fn(model, diffusion), opt)
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


@pytest.mark.parametrize("use_mamba2", [False, True])
def test_tp_collective_count(use_mamba2):
    """The TP design contract, asserted on compiled HLO: activations stay
    sharded through conv/scan/gate, with exactly two all-reduces per Mamba1
    mixer (tiny x_proj psum + out_proj psum) / two per Mamba2 mixer (norm
    sum-of-squares psum + out_proj psum) -- and no all-gathers of
    activations."""
    from diffma_tpu.models.mamba import Mamba
    from diffma_tpu.models.mamba2 import Mamba2
    from diffma_tpu.ops.scan_orders import build_scan_spec

    mesh = make_mesh(dp=1, tp=2, sp=1, devices=jax.devices()[:2])
    cls = Mamba2 if use_mamba2 else Mamba
    mixer = cls(d_model=512, d_state=16, mesh=mesh, tp_axis="tp")
    spec = build_scan_spec("zig", 4, 0)  # single stream, L=16
    x = jnp.ones((2, 16, 512), jnp.float32)
    params = mixer.init(jax.random.PRNGKey(0), x, spec)

    fn = jax.jit(lambda p, x: mixer.apply(p, x, spec))
    hlo = fn.lower(params, x).compile().as_text()
    n_ar = hlo.count(" all-reduce(") + hlo.count(" all-reduce-start(")
    assert n_ar == 2, f"expected exactly 2 all-reduces, found {n_ar}"
    assert "all-gather" not in hlo, "activations were re-gathered under tp"


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


@pytest.mark.slow
def test_two_real_processes_train_and_match():
    """THE multi-process runtime, for real: 2 spawned processes x 4 virtual
    CPU devices run train.main through jax.distributed (gloo collectives,
    per-host loader shard, make_array_from_process_local_data, cross-process
    grad psum, collective Orbax ckpt + barrier) and assert parameter parity
    with a single-device replica.  Mirrors the reference's torchrun
    operating mode (README.md:84-97)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_", "DIFFMA_"))
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "run_multiprocess_smoke.py")],
        capture_output=True, text=True, timeout=1700, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
    assert proc.stdout.count("MULTIPROC PARITY OK") == 2, proc.stdout[-4000:]
