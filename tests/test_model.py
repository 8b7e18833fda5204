"""Model-level tests: registry, all block families, both mixers, zero-init,
U-skips, CFG helper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffma_tpu.models import DiffMa, DiffMa_models
from diffma_tpu.models.diffma import build_model


def _inputs(N=2, C=4, H=8, T=16, D=512, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    return (
        jax.random.normal(ks[0], (N, C, H, H)),
        jnp.array([3, 500][:N]),
        jax.random.normal(ks[1], (N, D)),
        jax.random.normal(ks[2], (N, T, D)),
        jax.nn.sigmoid(jax.random.normal(ks[3], (N, T, 1))),
    )


def test_registry_matches_reference_surface():
    # model.py:634-673: 5 sizes x 3 patches for DiffMa, 4x3+BL for the four
    # reproduction families, 4x3+SB for DiT.
    assert len(DiffMa_models) == 80
    for name in (
        "DiffMa-XXL/2", "DiffMa-S/7", "ZigMa-BL/2", "ViM-L/4",
        "VMamba-B/7", "EMamba-BL/2", "DiT-SB/2", "DiT-XL/2",
    ):
        assert name in DiffMa_models, name


@pytest.mark.parametrize(
    "block_type",
    ["spiral", "zig", "vim", "vmamba", "efficientVMamba", "DiT"],
)
def test_all_block_families_forward(block_type):
    m = DiffMa(
        input_size=8, patch_size=2, depth=2, hidden_size=512,
        block_type=block_type, d_state=4,
    )
    args = _inputs()
    vars_ = m.init(jax.random.PRNGKey(0), *args)
    out = m.apply(vars_, *args)
    assert out.shape == (2, 8, 8, 8)
    # adaLN-Zero + zero final layer => exact zero output at init
    assert float(jnp.abs(out).max()) == 0.0


def test_efficient_vmamba_with_mamba2():
    """eff + Mamba2: broken upstream (block/mamba2.py:704 passes token lists
    to a 1-arg forward); the uniform ScanSpec design fixes it here."""
    m = DiffMa(
        input_size=8, patch_size=2, depth=2, hidden_size=512,
        block_type="efficientVMamba", d_state=16, use_mamba2=True,
    )
    args = _inputs()
    vars_ = m.init(jax.random.PRNGKey(0), *args)
    out = m.apply(vars_, *args)
    assert out.shape == (2, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_mamba2_path_forward():
    m = DiffMa(
        input_size=8, patch_size=2, depth=2, hidden_size=512,
        block_type="spiral", d_state=16, use_mamba2=True,
    )
    args = _inputs()
    vars_ = m.init(jax.random.PRNGKey(0), *args)
    out = m.apply(vars_, *args)
    assert out.shape == (2, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_learn_sigma_false_output_channels():
    m = DiffMa(
        input_size=8, patch_size=2, depth=1, block_type="zig",
        learn_sigma=False, d_state=4,
    )
    args = _inputs()
    vars_ = m.init(jax.random.PRNGKey(0), *args)
    assert m.apply(vars_, *args).shape == (2, 4, 8, 8)


@pytest.mark.slow
def test_nonzero_after_perturbing_final_layer():
    """The network must produce signal once the zero-init is broken and be
    sensitive to the conditioning inputs."""
    m = DiffMa(input_size=8, patch_size=2, depth=3, block_type="spiral", d_state=4)
    args = _inputs()
    vars_ = m.init(jax.random.PRNGKey(0), *args)
    vars_ = jax.tree.map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(1), p.shape, p.dtype),
        vars_,
    )
    out1 = m.apply(vars_, *args)
    x, t, y, y2, w = args
    out2 = m.apply(vars_, x, t, y + 1.0, y2, w)
    out3 = m.apply(vars_, x, t, y, y2, w * 0.1)
    assert float(jnp.abs(out1).max()) > 0
    assert float(jnp.abs(out1 - out2).max()) > 0  # y conditioning reaches output
    assert float(jnp.abs(out1 - out3).max()) > 0  # soft mask reaches output


def test_uskip_depth_indexing_matches_reference():
    """Replicate model.py:286-295 on a toy 'block' to validate our loop."""
    depth = 5

    def ref_loop(x, f):
        outs = []
        for i in range(depth):
            if i == 0:
                v = f(i, x)
            elif i > depth / 2:
                v = f(i, outs[-1] + outs[depth - i - 1])
            else:
                v = f(i, outs[-1])
            outs.append(v)
        return outs[-1]

    # Same loop shape as DiffMa.__call__
    def ours(x, f):
        outputs = []
        for i in range(depth):
            if i == 0:
                inp = x
            elif i > depth / 2:
                inp = outputs[-1] + outputs[depth - i - 1]
            else:
                inp = outputs[-1]
            outputs.append(f(i, inp))
        return outputs[-1]

    f = lambda i, v: v * (i + 2)  # noqa: E731
    assert ref_loop(3.0, f) == ours(3.0, f)


def test_forward_with_cfg():
    m = DiffMa(input_size=8, patch_size=2, depth=1, block_type="zig", d_state=4)
    x, t, y, y2, w = _inputs(N=4)
    vars_ = m.init(jax.random.PRNGKey(0), x, t[:2].repeat(2), y, y2, w)
    out = m.forward_with_cfg(vars_, x, jnp.zeros(4, jnp.int32), y, y2, w, 4.0)
    assert out.shape == (4, 8, 8, 8)
    # the two halves of the guided eps must be identical
    np.testing.assert_array_equal(np.asarray(out[:2, :3]), np.asarray(out[2:, :3]))


@pytest.mark.slow
def test_gradients_flow():
    m = DiffMa(input_size=8, patch_size=2, depth=2, block_type="spiral", d_state=4)
    args = _inputs()
    vars_ = m.init(jax.random.PRNGKey(0), *args)

    def loss(v):
        return jnp.mean(jnp.square(m.apply(v, *args) - 1.0))

    grads = jax.grad(loss)(vars_)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least the final layer and adaLN branches must receive gradient
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert total > 0
