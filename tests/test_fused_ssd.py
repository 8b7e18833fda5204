"""Block-level fused SSD mixer kernel (ops/fused_ssd.py) parity tests.

The kernel runs in_proj -> one-hot-matmul stream permutation -> conv ->
chunkless per-head SSD (decay tiles in VMEM) -> gated RMSNorm ->
inverse-permute merge -> out_proj in one Pallas call (interpret mode
off-TPU); it must match the composable Mamba2 path in values and (through
the hand-derived Pallas backward kernel) gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffma_tpu.ops.fused_ssd import (
    _ssd_mixer_ref,
    mamba2_dual_mixer_fused,
    mamba2_mixer_fused,
)
from diffma_tpu.ops.scan_orders import build_scan_spec

_NOLIM = (0.0, float("inf"))


def _args(seed=0, B=2, L=16, h=32, d=64, n=8, H=4, K=4, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 9)
    dproj = 2 * d + 2 * n + H
    conv_dim = d + 2 * n
    x = jax.random.normal(ks[0], (B, L, h), dtype)
    in_w = jax.random.normal(ks[1], (h, dproj)) * 0.05
    conv_w = jax.random.normal(ks[2], (conv_dim, K)) * 0.3
    conv_b = jax.random.normal(ks[3], (conv_dim,)) * 0.1
    dt_bias = jax.random.normal(ks[4], (H,)) * 0.2
    A_log = jax.random.uniform(ks[5], (H,), minval=0.0, maxval=1.5)
    D = jax.random.normal(ks[6], (H,)) * 0.5 + 1.0
    norm_w = jax.random.normal(ks[7], (d,)) * 0.1 + 1.0
    out_w = jax.random.normal(ks[8], (d, h)) * 0.05
    return (x, in_w, conv_w, conv_b, dt_bias, A_log, D, norm_w, out_w)


def _tol():
    return 2e-5 if jax.default_backend() != "tpu" else 5e-4


@pytest.mark.parametrize(
    "block_type,layer",
    [("spiral", 0), ("spiral", 3), ("zig", 1), ("vmamba", 0), ("eff", 0)],
)
def test_forward_matches_composable(block_type, layer):
    spec = build_scan_spec(block_type, 4, layer)
    args = _args(seed=layer)
    got = np.asarray(mamba2_mixer_fused(spec, *args, _NOLIM, 1e-5, 256))
    want = np.asarray(
        _ssd_mixer_ref(spec, *args, dt_limit=_NOLIM, eps=1e-5, chunk_size=256)
    )
    np.testing.assert_allclose(got, want, rtol=_tol(), atol=_tol())


def test_unpadded_length():
    """L=25 is not sublane-aligned; pads must not leak."""
    spec = build_scan_spec("zig", 5, 1)
    args = _args(B=1, L=25)
    got = np.asarray(mamba2_mixer_fused(spec, *args, _NOLIM, 1e-5, 256))
    want = np.asarray(
        _ssd_mixer_ref(spec, *args, dt_limit=_NOLIM, eps=1e-5, chunk_size=256)
    )
    np.testing.assert_allclose(got, want, rtol=_tol(), atol=_tol())


def test_dt_limit_applied():
    spec = build_scan_spec("zig", 4, 0)
    args = _args()
    lim = (0.01, 0.05)
    got = np.asarray(mamba2_mixer_fused(spec, *args, lim, 1e-5, 256))
    want = np.asarray(
        _ssd_mixer_ref(spec, *args, dt_limit=lim, eps=1e-5, chunk_size=256)
    )
    np.testing.assert_allclose(got, want, rtol=_tol(), atol=_tol())
    unclipped = np.asarray(mamba2_mixer_fused(spec, *args, _NOLIM, 1e-5, 256))
    assert np.abs(got - unclipped).max() > 1e-4  # the limit must matter


def test_dual_matches_two_singles():
    spec = build_scan_spec("spiral", 4, 1)
    a1 = _args(seed=1)
    a2 = _args(seed=2)
    x12 = jnp.stack([a1[0], a2[0]])
    stacked = tuple(jnp.stack([w1, w2]) for w1, w2 in zip(a1[1:], a2[1:]))
    got = np.asarray(
        mamba2_dual_mixer_fused(spec, x12, *stacked, _NOLIM, 1e-5, 256)
    )
    for m, a in enumerate((a1, a2)):
        want = np.asarray(mamba2_mixer_fused(spec, *a, _NOLIM, 1e-5, 256))
        np.testing.assert_allclose(got[m], want, rtol=_tol(), atol=_tol())


def test_bf16_forward():
    spec = build_scan_spec("spiral", 4, 0)
    args = _args(dtype=jnp.bfloat16)
    got = np.asarray(
        mamba2_mixer_fused(spec, *args, _NOLIM, 1e-5, 256).astype(jnp.float32)
    )
    want = np.asarray(
        _ssd_mixer_ref(
            spec, *args, dt_limit=_NOLIM, eps=1e-5, chunk_size=256
        ).astype(jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.slow
@pytest.mark.parametrize("block_type", ["spiral", "eff"])
def test_grads_match_composable(block_type):
    spec = build_scan_spec(block_type, 4, 0)
    args = _args(B=1)

    def f_fused(*a):
        return jnp.sum(jnp.tanh(mamba2_mixer_fused(spec, *a, _NOLIM, 1e-5, 256)))

    def f_ref(*a):
        return jnp.sum(
            jnp.tanh(
                _ssd_mixer_ref(
                    spec, *a, dt_limit=_NOLIM, eps=1e-5, chunk_size=256
                )
            )
        )

    g1 = jax.grad(f_fused, argnums=tuple(range(len(args))))(*args)
    g2 = jax.grad(f_ref, argnums=tuple(range(len(args))))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


@pytest.mark.parametrize("block_type", ["spiral", "vim", "eff"])
def test_mamba2_module_fused_matches_auto(block_type):
    # vim: Mamba2 does NOT honour the Mamba1 feature-flip quirk
    # (block/mamba2.py:502,522 flips correctly), so the standard fused
    # merge must match the composable merge-table path.  eff exercises the
    # rectangular (Lr x L) partition kernels.
    from diffma_tpu.models.mamba2 import Mamba2

    spec = build_scan_spec(block_type, 4, 0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    m_auto = Mamba2(d_model=32, d_state=8, scan_impl="auto")
    m_fused = Mamba2(d_model=32, d_state=8, scan_impl="fused")
    params = m_auto.init(jax.random.PRNGKey(1), x, spec)
    params_f = m_fused.init(jax.random.PRNGKey(1), x, spec)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    )
    want = np.asarray(m_auto.apply(params, x, spec))
    got = np.asarray(m_fused.apply(params, x, spec))
    np.testing.assert_allclose(got, want, rtol=_tol(), atol=_tol())


def test_dual_branch_block_fused_matches_auto():
    """SpiralMambaBlock(use_mamba2) with scan_impl='fused' batches both
    branches into one stacked SSD kernel launch."""
    from diffma_tpu.models.blocks import SpiralMambaBlock

    spec = build_scan_spec("spiral", 4, 0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    w = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(2), (2, 16, 1)))
    b_auto = SpiralMambaBlock(
        hidden=32, d_state=8, use_mamba2=True, scan_impl="auto"
    )
    b_fused = SpiralMambaBlock(
        hidden=32, d_state=8, use_mamba2=True, scan_impl="fused"
    )
    params = b_auto.init(jax.random.PRNGKey(3), x, c, w, spec)
    params_f = b_fused.init(jax.random.PRNGKey(3), x, c, w, spec)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    )
    want = np.asarray(b_auto.apply(params, x, c, w, spec))
    got = np.asarray(b_fused.apply(params, x, c, w, spec))
    np.testing.assert_allclose(got, want, rtol=_tol(), atol=_tol())


@pytest.mark.slow
def test_dual_branch_block_fused_grads():
    from diffma_tpu.models.blocks import SpiralMambaBlock

    spec = build_scan_spec("spiral", 4, 0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    w = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(2), (2, 16, 1)))
    b_auto = SpiralMambaBlock(
        hidden=32, d_state=8, use_mamba2=True, scan_impl="auto"
    )
    b_fused = SpiralMambaBlock(
        hidden=32, d_state=8, use_mamba2=True, scan_impl="fused"
    )
    params = b_auto.init(jax.random.PRNGKey(3), x, c, w, spec)
    g1 = jax.grad(
        lambda p: jnp.sum(jnp.tanh(b_fused.apply(p, x, c, w, spec)))
    )(params)
    g2 = jax.grad(
        lambda p: jnp.sum(jnp.tanh(b_auto.apply(p, x, c, w, spec)))
    )(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


@pytest.mark.slow
def test_fused_composes_with_remat():
    """Per-block remat (jax.checkpoint) over the fused custom_vjp kernels
    must reproduce the non-remat gradients (the DiffMa-XXL/2 train path)."""
    from diffma_tpu.models.blocks import SpiralMambaBlock

    spec = build_scan_spec("spiral", 4, 0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    w = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(2), (2, 16, 1)))
    blk = SpiralMambaBlock(hidden=32, d_state=8, use_mamba2=True,
                           scan_impl="fused")
    params = blk.init(jax.random.PRNGKey(3), x, c, w, spec)

    def loss(p, apply):
        return jnp.sum(jnp.tanh(apply(p, x, c, w, spec)))

    g_plain = jax.grad(lambda p: loss(p, blk.apply))(params)
    remat_apply = jax.checkpoint(
        lambda p, *a: blk.apply(p, *a), static_argnums=(4,)
    )
    g_remat = jax.grad(
        lambda p: jnp.sum(jnp.tanh(remat_apply(p, x, c, w, spec)))
    )(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


@pytest.mark.slow
def test_block_fused_spiral_matches_unfused():
    """fuse_block=True (whole SpiralMambaBlock as two Pallas calls) must
    match the mixer-fused path with the SAME param tree, fwd + grads."""
    from diffma_tpu.models.blocks import SpiralMambaBlock

    spec = build_scan_spec("spiral", 4, 0)
    B, L, h = 2, 16, 64
    kw = dict(hidden=h, d_state=16, use_mamba2=True, scan_impl="fused")
    blk0 = SpiralMambaBlock(**kw)
    blk1 = SpiralMambaBlock(**kw, fuse_block=True)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (B, L, h))
    c = jax.random.normal(ks[1], (B, 2 * h))
    w = jax.nn.sigmoid(jax.random.normal(ks[2], (B, L, 1)))
    params = blk0.init(ks[3], x, c, w, spec)
    # break the adaLN-zero identity so the whole block participates
    params = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(
            jax.random.PRNGKey(9), a.shape, a.dtype
        ),
        params,
    )
    want = blk0.apply(params, x, c, w, spec)
    got = blk1.apply(params, x, c, w, spec)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )

    def loss(p, m):
        return jnp.mean(jnp.square(m.apply(p, x, c, w, spec)))

    g0 = jax.grad(loss)(params, blk0)
    g1 = jax.grad(loss)(params, blk1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        scale = float(jnp.abs(np.asarray(a)).max()) + 1e-8
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, rtol=2e-5, atol=2e-5
        )


def _span_args(scale_dt, seed=3, **kw):
    """_args with dt shifted so every head's decay span lands decisively on
    one side of the factored/quadratic runtime split (ops/fused_ssd.py
    ``_SAFE_RANGE``): scale_dt < 0 pushes dt_bias very negative (softplus
    -> tiny dt, span ~ 0 -> factored); large positive bias grows the span
    past the bound -> quadratic."""
    args = list(_args(seed=seed, **kw))
    args[4] = jnp.full_like(args[4], scale_dt)  # dt_bias
    return tuple(args)


@pytest.mark.parametrize(
    "dt_bias,branch,mode",
    [
        # the runtime-dispatch (auto) kernel, both branches -- no longer the
        # default (round 5 measured its dual-body tax at 22-28%; see
        # ops/fused_ssd.py decay-form note) but still a supported hatch
        (-6.0, "factored", "auto"),
        (0.65, "quadratic", "auto"),
        # the static single-body forms, incl. the shipped default
        (0.65, "quadratic", "quadratic"),
        (-6.0, "factored", "factored"),
    ],
)
def test_decay_branches_match_composable(dt_bias, branch, mode, monkeypatch):
    """Every decay form (static quadratic default, static factored, and both
    branches of the runtime-dispatch kernel) must match the composable path
    in values AND grads.

    dt_bias=-6 -> dt ~ softplus(-6+x) ~ 1e-2, per-head span << _SAFE_RANGE
    (factored-safe); dt_bias=0.65 lands the max per-head span at ~70 --
    past the bound (quadratic territory) but still below fp32-exp overflow,
    where the COMPOSABLE reference's chunked autodiff itself goes NaN
    (measured: its grads are NaN from span ~90, the fused quadratic path
    stays finite far beyond).  The span is asserted, not assumed."""
    import diffma_tpu.ops.fused_ssd as fssd

    monkeypatch.setattr(fssd, "_static_decay_mode", lambda: mode)
    spec = build_scan_spec("spiral", 4, 1)
    args = _span_args(dt_bias)
    x, in_w, conv_w, conv_b, dt_bias_a, A_log, D, norm_w, out_w = args
    # verify which side of the split these inputs actually land on
    zx = x @ in_w
    d, n, H = 64, 8, 4
    dtraw = zx[..., -H:]  # pre-conv dt columns (conv does not touch dt)
    dt = jax.nn.softplus(dtraw + dt_bias_a)
    span = float(jnp.max(jnp.sum(dt, axis=1) * jnp.exp(A_log)))
    if branch == "factored":
        assert span < fssd._SAFE_RANGE, span
    else:
        assert fssd._SAFE_RANGE < span < 85.0, span

    def f_fused(*a):
        return jnp.sum(jnp.tanh(mamba2_mixer_fused(spec, *a, _NOLIM, 1e-5, 256)))

    def f_ref(*a):
        return jnp.sum(
            jnp.tanh(
                _ssd_mixer_ref(spec, *a, dt_limit=_NOLIM, eps=1e-5, chunk_size=256)
            )
        )

    v1, g1 = jax.value_and_grad(f_fused, argnums=(0, 1, 4, 5))(*args)
    v2, g2 = jax.value_and_grad(f_ref, argnums=(0, 1, 4, 5))(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4
        )
