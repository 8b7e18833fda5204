"""Sequence-parallel SSD: sharding L over the mesh must match the full scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow'

if jax.device_count() < 8:
    pytest.skip("needs the 8-device virtual mesh", allow_module_level=True)

from jax.sharding import Mesh

from diffma_tpu.ops.ssd import ssd_chunked, ssd_ref
from diffma_tpu.parallel.sequence import ssd_sequence_parallel


def _inputs(G=2, L=64, H=4, P=8, N=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (G, L, H, P))
    dt = jax.random.normal(ks[1], (G, L, H)) * 0.5
    A = -jnp.exp(jax.random.uniform(ks[2], (H,), minval=0.0, maxval=2.0))
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    D = jax.random.normal(ks[5], (H,))
    dt_bias = jnp.linspace(-4.0, -2.0, H)
    return x, dt, A, B, C, D, dt_bias


def test_initial_state_threading():
    """ssd_chunked(initial_state) == running the two halves back to back."""
    x, dt, A, B, C, D, db = _inputs(L=48)
    full = ssd_ref(x, dt, A, B, C, D, db)
    h = 24
    y1, s1 = ssd_chunked(
        x[:, :h], dt[:, :h], A, B[:, :h], C[:, :h], D, dt_bias=db,
        chunk_size=8, return_final_state=True,
    )
    y2 = ssd_chunked(
        x[:, h:], dt[:, h:], A, B[:, h:], C[:, h:], D, dt_bias=db,
        chunk_size=8, initial_state=s1,
    )
    got = jnp.concatenate([y1, y2], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("ndev", [4, 8])
def test_sequence_parallel_matches_ref(ndev):
    x, dt, A, B, C, D, db = _inputs(L=64)
    ref = ssd_ref(x, dt, A, B, C, D, db)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("sp",))
    got = ssd_sequence_parallel(
        x, dt, A, B, C, D, mesh, axis="sp", dt_bias=db, chunk_size=8
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("gated", [True, False])
def test_mamba1_sequence_parallel_matches_ref(gated):
    from diffma_tpu.ops.selective_scan import selective_scan_ref
    from diffma_tpu.parallel.sequence import selective_scan_sequence_parallel

    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    G, L, d, n = 2, 64, 16, 8
    u = jax.random.normal(ks[0], (G, L, d))
    delta = jax.random.normal(ks[1], (G, L, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.3)
    B = jax.random.normal(ks[3], (G, L, n))
    C = jax.random.normal(ks[4], (G, L, n))
    D = jnp.ones((d,))
    z = jax.random.normal(ks[5], (G, L, d)) if gated else None

    ref = selective_scan_ref(u, delta, A, B, C, D, z=z)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    got = selective_scan_sequence_parallel(u, delta, A, B, C, D, mesh, z=z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_mamba1_sequence_parallel_grads():
    from diffma_tpu.ops.selective_scan import selective_scan_ref
    from diffma_tpu.parallel.sequence import selective_scan_sequence_parallel

    ks = jax.random.split(jax.random.PRNGKey(4), 6)
    G, L, d, n = 1, 32, 8, 4
    u = jax.random.normal(ks[0], (G, L, d))
    delta = jax.random.normal(ks[1], (G, L, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.3)
    B = jax.random.normal(ks[3], (G, L, n))
    C = jax.random.normal(ks[4], (G, L, n))
    D = jnp.ones((d,))
    z = jax.random.normal(ks[5], (G, L, d))
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))

    def loss_sp(u, delta, B, C):
        return jnp.sum(jnp.tanh(
            selective_scan_sequence_parallel(u, delta, A, B, C, D, mesh, z=z)
        ))

    def loss_ref(u, delta, B, C):
        return jnp.sum(jnp.tanh(selective_scan_ref(u, delta, A, B, C, D, z=z)))

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2, 3))(u, delta, B, C)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(u, delta, B, C)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_sequence_parallel_grads():
    x, dt, A, B, C, D, db = _inputs(G=1, L=32, H=2, P=4, N=4)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))

    def loss_sp(x, dt, B, C):
        return jnp.sum(
            jnp.tanh(
                ssd_sequence_parallel(
                    x, dt, A, B, C, D, mesh, dt_bias=db, chunk_size=8
                )
            )
        )

    def loss_ref(x, dt, B, C):
        return jnp.sum(jnp.tanh(ssd_ref(x, dt, A, B, C, D, db)))

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2, 3))(x, dt, B, C)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, dt, B, C)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Model-level SP: the sp_axis module option must be reachable from DiffMa
# (config key `sp`) and reproduce the unsharded computation.
# ---------------------------------------------------------------------------


def _sp_models(use_mamba2, sp=4):
    from diffma_tpu.models.diffma import DiffMa
    from diffma_tpu.parallel import make_mesh

    mesh = make_mesh(dp=8 // sp, tp=1, sp=sp)
    kw = dict(
        input_size=8, patch_size=2, depth=2, hidden_size=128,
        block_type="spiral", d_state=16, use_mamba2=use_mamba2,
    )
    return DiffMa(**kw, mesh=mesh, sp_axis="sp"), DiffMa(**kw), mesh


@pytest.mark.parametrize("use_mamba2", [False, True])
def test_model_level_sp_matches_unsharded(use_mamba2):
    model_sp, model0, mesh = _sp_models(use_mamba2)
    from diffma_tpu.train.train import synthetic_batch

    b = synthetic_batch(jax.random.PRNGKey(0), 2, 8, 16, dim=128)
    t = jnp.array([3, 700], jnp.int32)
    params = model0.init(jax.random.PRNGKey(1), b["z"], t, b["y"], b["y2"], b["w"])

    want = np.asarray(model0.apply(params, b["z"], t, b["y"], b["y2"], b["w"]))
    with mesh:
        got = np.asarray(
            jax.jit(lambda p, *a: model_sp.apply(p, *a))(
                params, b["z"], t, b["y"], b["y2"], b["w"]
            )
        )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_train_step_with_sp_active():
    """Full training step with the scans sequence-parallel over sp=4."""
    import optax

    from diffma_tpu.diffusion import create_diffusion
    from diffma_tpu.parallel import shard_batch, shard_params
    from diffma_tpu.train.state import TrainState, make_train_step
    from diffma_tpu.train.train import make_loss_fn, synthetic_batch

    model_sp, model0, mesh = _sp_models(use_mamba2=False)
    diffusion = create_diffusion("")
    batch = synthetic_batch(jax.random.PRNGKey(0), 4, 8, 16, dim=128)
    params = model0.init(
        jax.random.PRNGKey(1), batch["z"], jnp.zeros(4, jnp.int32),
        batch["y"], batch["y2"], batch["w"],
    )["params"]
    opt = optax.adamw(1e-3, weight_decay=0.0)

    s0 = TrainState.create(params, opt)
    s0, m0 = jax.jit(make_train_step(make_loss_fn(model0, diffusion), opt))(
        s0, batch, jax.random.PRNGKey(2)
    )

    step = make_train_step(make_loss_fn(model_sp, diffusion), opt)
    with mesh:
        s1 = TrainState.create(shard_params(params, mesh), opt)
        sb = shard_batch(jax.tree.map(np.asarray, batch), mesh)
        s1, m1 = jax.jit(step, donate_argnums=(0,))(s1, sb, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=2e-4)


# ---------------------------------------------------------------------------
# tp x sp composition in ONE mixer (the reference couples them the same way:
# sequence_parallel is a mode of the tensor-parallel group,
# block/mamba2.py:260,276,708-710)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_mamba2", [False, True])
def test_mixer_tp_sp_composed_matches_unsharded(use_mamba2):
    """Mixer-level: tp=2 x sp=2 (heads tp-sliced, scan sequence-parallel
    inside the tp shard, one psum over {tp, sp}) == plain forward + grads."""
    from diffma_tpu.models.mamba import Mamba
    from diffma_tpu.models.mamba2 import Mamba2
    from diffma_tpu.ops.scan_orders import build_scan_spec

    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2), ("dp", "tp", "sp"))
    spec = build_scan_spec("spiral", 4, 0)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 64))
    if use_mamba2:
        ref = Mamba2(d_model=64, d_state=16, headdim=16)
        m = Mamba2(d_model=64, d_state=16, headdim=16, mesh=mesh,
                   tp_axis="tp", sp_axis="sp")
    else:
        ref = Mamba(d_model=64, d_state=8)
        m = Mamba(d_model=64, d_state=8, mesh=mesh, tp_axis="tp", sp_axis="sp")

    p = ref.init(jax.random.PRNGKey(1), x, spec)
    want = ref.apply(p, x, spec)
    got = m.apply(p, x, spec)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )

    def loss(p, mod):
        return jnp.mean(jnp.square(mod.apply(p, x, spec)))

    g_ref = jax.grad(loss)(p, ref)
    g_tp = jax.grad(loss)(p, m)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, rtol=5e-4, atol=5e-4
        )


def test_mixer_tp_sp_requires_divisible_length():
    from diffma_tpu.models.mamba2 import Mamba2
    from diffma_tpu.ops.scan_orders import ScanSpec
    import numpy as onp

    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2), ("dp", "tp", "sp"))
    # stream length 15 is not divisible by sp=2
    fwd = onp.arange(15, dtype=onp.int32)[None, :]
    merge = onp.arange(15, dtype=onp.int32)[:, None]
    spec = ScanSpec(fwd=fwd, merge=merge, scale=1.0)
    m = Mamba2(d_model=64, d_state=16, headdim=16, mesh=mesh,
               tp_axis="tp", sp_axis="sp")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 15, 64))
    with pytest.raises(ValueError, match="divisible by the sp axis"):
        m.init(jax.random.PRNGKey(1), x, spec)


def test_train_step_dp_tp_sp_all_axes():
    """Full training step on the dp=2 x tp=2 x sp=2 mesh with sp composed
    INSIDE the tp mixers; loss matches the unsharded step."""
    import optax

    from diffma_tpu.diffusion import create_diffusion
    from diffma_tpu.models.diffma import DiffMa
    from diffma_tpu.parallel import make_mesh, shard_batch, shard_params
    from diffma_tpu.train.state import TrainState, make_train_step
    from diffma_tpu.train.train import make_loss_fn, synthetic_batch

    mesh = make_mesh(dp=2, tp=2, sp=2)
    kw = dict(
        input_size=8, patch_size=2, depth=2, hidden_size=128,
        block_type="spiral", d_state=16,
    )
    model = DiffMa(**kw, mesh=mesh, tp_axis="tp", sp_axis="sp")
    model0 = DiffMa(**kw)
    diffusion = create_diffusion("")
    batch = synthetic_batch(jax.random.PRNGKey(0), 4, 8, 16, dim=128)
    params = model0.init(
        jax.random.PRNGKey(1), batch["z"], jnp.zeros(4, jnp.int32),
        batch["y"], batch["y2"], batch["w"],
    )["params"]
    opt = optax.adamw(1e-3, weight_decay=0.0)

    s0 = TrainState.create(params, opt)
    s0, m0 = jax.jit(make_train_step(make_loss_fn(model0, diffusion), opt))(
        s0, batch, jax.random.PRNGKey(2)
    )

    step = make_train_step(make_loss_fn(model, diffusion), opt)
    with mesh:
        s1 = TrainState.create(shard_params(params, mesh), opt)
        sb = shard_batch(jax.tree.map(np.asarray, batch), mesh)
        s1, m1 = jax.jit(step, donate_argnums=(0,))(s1, sb, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=2e-4)
    # the updated sharded params stay in sync with the unsharded step
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3
        )
