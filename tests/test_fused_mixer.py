"""Block-level fused mixer kernel (ops/fused_mixer.py) parity tests.

The kernel runs in_proj -> one-hot-matmul stream permutation -> conv ->
projections -> chunked scan -> gate -> inverse-permute merge -> out_proj in
one Pallas call (interpret mode off-TPU); it must match the composable
reference path in values and (through the recompute VJP) gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffma_tpu.ops.fused_mixer import (
    _mixer_ref,
    mamba_mixer_fused,
    mixer_fused_eligible,
)
from diffma_tpu.ops.scan_orders import build_scan_spec


def _args(seed=0, B=2, L=16, h=32, d=64, n=8, r=4, K=4, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    x = jax.random.normal(ks[0], (B, L, h), dtype)
    in_w = jax.random.normal(ks[1], (h, 2 * d)) * 0.1
    conv_w = jax.random.normal(ks[2], (d, K)) * 0.3
    conv_b = jax.random.normal(ks[3], (d,)) * 0.1
    xp_w = jax.random.normal(ks[4], (d, r + 2 * n)) * 0.1
    dt_w = jax.random.normal(ks[5], (r, d)) * 0.2
    dt_b = jax.random.normal(ks[6], (d,)) * 0.1
    A = -jnp.exp(jax.random.normal(ks[7], (d, n)) * 0.3)
    D = jax.random.normal(ks[8], (d,))
    out_w = jax.random.normal(ks[9], (d, h)) * 0.1
    return (x, in_w, conv_w, conv_b, xp_w, dt_w, dt_b, A, D, out_w)


def test_eligibility():
    assert mixer_fused_eligible(build_scan_spec("spiral", 4, 0))
    assert mixer_fused_eligible(build_scan_spec("zig", 4, 2))
    assert mixer_fused_eligible(build_scan_spec("vmamba", 4, 0))
    assert mixer_fused_eligible(build_scan_spec("vim", 4, 0))  # quirk in-kernel
    # atrous partition: Mamba1 kernel handles it (rect P); Mamba2 does not
    assert not mixer_fused_eligible(build_scan_spec("eff", 4, 0))
    assert mixer_fused_eligible(build_scan_spec("eff", 4, 0), partition=True)


@pytest.mark.parametrize(
    "block_type,layer",
    [
        ("spiral", 0), ("spiral", 3), ("zig", 1), ("vmamba", 0), ("vim", 0),
        ("eff", 0), ("eff", 1),
    ],
)
def test_forward_matches_composable(block_type, layer):
    spec = build_scan_spec(block_type, 4, layer)
    args = _args(seed=layer)
    got = np.asarray(mamba_mixer_fused(spec, *args))
    want = np.asarray(_mixer_ref(spec, *args))
    tol = 2e-5 if jax.default_backend() != "tpu" else 5e-4
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_unpadded_length():
    """L=25 is not a multiple of the kernel chunk; pads must not leak."""
    spec = build_scan_spec("zig", 5, 1)  # L=25
    args = _args(B=1, L=25)
    got = np.asarray(mamba_mixer_fused(spec, *args))
    want = np.asarray(_mixer_ref(spec, *args))
    tol = 2e-5 if jax.default_backend() != "tpu" else 5e-4
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


@pytest.mark.slow
@pytest.mark.parametrize("block_type,layer", [("spiral", 1), ("vim", 0)])
def test_monolithic_bwd_matches_decomposed(monkeypatch, block_type, layer):
    """The monolithic backward kernel (one Pallas call: in-VMEM forward
    recompute + scan adjoint + all weight grads) must agree with the
    round-2 decomposed VJP it replaced (DIFFMA_MIXER_BWD=decomposed).
    'vim' exercises the quirk branch (flipped-g stream gradient, no row
    permute) added in round 4."""
    import diffma_tpu.ops.fused_mixer as fm

    spec = build_scan_spec(block_type, 4, layer)
    args = _args(seed=7)
    argnums = tuple(range(len(args)))

    def grads():
        return jax.grad(
            lambda *a: jnp.sum(jnp.tanh(mamba_mixer_fused(spec, *a))),
            argnums=argnums,
        )(*args)

    monkeypatch.setenv("DIFFMA_MIXER_BWD", "decomposed")
    assert not fm._use_monolithic_bwd()
    g_dec = grads()
    monkeypatch.delenv("DIFFMA_MIXER_BWD")
    assert fm._use_monolithic_bwd()
    g_mono = grads()
    for a, b in zip(g_mono, g_dec):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


@pytest.mark.slow
def test_monolithic_bwd_bf16_close_to_fp32():
    """bf16 gradients through the monolithic backward (the TPU training
    path) must stay finite and track the fp32 gradients to a few percent
    mean-relative error on every cotangent."""
    spec = build_scan_spec("spiral", 4, 0)
    args32 = _args(seed=3)
    argnums = tuple(range(len(args32)))

    def grads(args):
        return jax.grad(
            lambda *a: jnp.sum(jnp.tanh(mamba_mixer_fused(spec, *a))),
            argnums=argnums,
        )(*args)

    g32 = grads(args32)
    g16 = grads((args32[0].astype(jnp.bfloat16),) + args32[1:])
    for a, b in zip(g16, g32):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.isfinite(a).all()
        scale = np.abs(b).mean() + 1e-6
        assert np.abs(a - b).mean() / scale < 0.05


@pytest.mark.slow
@pytest.mark.parametrize("block_type", ["spiral", "vim", "eff"])
def test_grads_match_composable(block_type):
    spec = build_scan_spec(block_type, 4, 0)
    args = _args()
    argnums = tuple(range(len(args)))
    g1 = jax.grad(
        lambda *a: jnp.sum(jnp.tanh(mamba_mixer_fused(spec, *a))), argnums=argnums
    )(*args)
    g2 = jax.grad(
        lambda *a: jnp.sum(jnp.tanh(_mixer_ref(spec, *a))), argnums=argnums
    )(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_bf16_close_to_fp32():
    spec = build_scan_spec("spiral", 4, 0)
    args32 = _args()
    ref = np.asarray(_mixer_ref(spec, *args32), np.float32)
    args16 = (args32[0].astype(jnp.bfloat16),) + args32[1:]
    got = np.asarray(mamba_mixer_fused(spec, *args16), np.float32)
    scale = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).mean() / scale < 0.05


@pytest.mark.parametrize(
    "block_type,layer", [("spiral", 1), ("vim", 0), ("eff", 0)]
)
def test_model_fused_matches_auto(block_type, layer):
    """Mamba module with scan_impl='fused' routes through the block kernel
    and must match scan_impl='auto' (vim exercises the in-kernel feature-
    flip quirk against the module's composable quirk branch)."""
    from diffma_tpu.models.mamba import Mamba

    spec = build_scan_spec(block_type, 4, layer)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    m_auto = Mamba(d_model=32, d_state=8, scan_impl="auto")
    m_fused = Mamba(d_model=32, d_state=8, scan_impl="fused")
    params = m_auto.init(jax.random.PRNGKey(1), x, spec)
    want = np.asarray(m_auto.apply(params, x, spec))
    got = np.asarray(m_fused.apply(params, x, spec))
    tol = 2e-5 if jax.default_backend() != "tpu" else 5e-4
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_dual_branch_block_fused_matches_auto():
    """SpiralMambaBlock with scan_impl='fused' batches both branches into
    one stacked kernel launch; params and outputs must match the auto path."""
    from diffma_tpu.models.blocks import SpiralMambaBlock

    spec = build_scan_spec("spiral", 4, 0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    w = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(2), (2, 16, 1)))
    b_auto = SpiralMambaBlock(hidden=32, d_state=8, scan_impl="auto")
    b_fused = SpiralMambaBlock(hidden=32, d_state=8, scan_impl="fused")
    params = b_auto.init(jax.random.PRNGKey(3), x, c, w, spec)
    params_f = b_fused.init(jax.random.PRNGKey(3), x, c, w, spec)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    )
    want = np.asarray(b_auto.apply(params, x, c, w, spec))
    got = np.asarray(b_fused.apply(params, x, c, w, spec))
    tol = 2e-5 if jax.default_backend() != "tpu" else 5e-4
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


@pytest.mark.slow
def test_dual_branch_block_fused_grads():
    from diffma_tpu.models.blocks import SpiralMambaBlock

    spec = build_scan_spec("spiral", 4, 0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    w = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(2), (2, 16, 1)))
    b_auto = SpiralMambaBlock(hidden=32, d_state=8, scan_impl="auto")
    b_fused = SpiralMambaBlock(hidden=32, d_state=8, scan_impl="fused")
    params = b_auto.init(jax.random.PRNGKey(3), x, c, w, spec)
    g1 = jax.grad(lambda p: jnp.sum(jnp.tanh(b_fused.apply(p, x, c, w, spec))))(params)
    g2 = jax.grad(lambda p: jnp.sum(jnp.tanh(b_auto.apply(p, x, c, w, spec))))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
