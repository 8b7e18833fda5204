"""Registry-wide smoke: every one of the 80 ``DiffMa_models`` entries runs.

"Runs" is tiered to fit the 1-CPU test box:

- **Trace tier** (all 80 entries, both eligible ``scan_impl`` values): a full
  abstract interpretation of ``init`` + ``apply`` via ``jax.eval_shape``.
  This executes every line of model/blocks/mixer/scan-spec Python for the
  real registry depth/width — shape errors, spec-construction ValueErrors,
  wiring bugs, and Pallas grid/BlockSpec mismatches all surface here — at
  zero FLOPs.  (Eagerly running DiffMa-XXL/2, depth 56, takes >3 min on this
  box; tracing it takes ~13 s.)
- **Numeric tier** (one sample per family, registry-constructed at S/2):
  real init, forward, and one gradient step.  Per-family numerics at other
  patch sizes are covered by the trace tier plus the family-level tests in
  test_model.py / test_fused_*.py.
- The documented odd-grid EfficientVMamba failure raises its ValueError
  (reference parity: block/mamba.py:176-183 shape-errors on odd grids too).

Registry source: model.py:634-673 (5 sizes x 3 patches for DiffMa, 4x3+BL
for the reproduction families, 4x3+SB for DiT).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffma_tpu.models import DiffMa_models
from diffma_tpu.models.diffma import build_model

FAMILIES = ("DiffMa", "ZigMa", "ViM", "VMamba", "EMamba", "DiT")
# sizes whose depth is small enough for the fast pre-commit tier
_FAST_SIZES = {"S", "B", "SB"}


def _patch(name: str) -> int:
    return int(name.rsplit("/", 1)[1])


def _size(name: str) -> str:
    return name.split("-", 1)[1].rsplit("/", 1)[0]


def _input_size(name: str) -> int:
    # grid 4 (16 tokens) for every patch size; even, so atrous works
    return {2: 8, 4: 16, 7: 28}[_patch(name)]


def _args(input_size: int, N: int = 1, D: int = 512, T: int = 16):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    return (
        jax.random.normal(ks[0], (N, 4, input_size, input_size)),
        jnp.zeros((N,), jnp.int32),
        jax.random.normal(ks[1], (N, D)),
        jax.random.normal(ks[2], (N, T, D)),
        jax.nn.sigmoid(jax.random.normal(ks[3], (N, T, 1))),
    )


_ZOO = [
    pytest.param(
        name,
        id=name,
        marks=[] if _size(name) in _FAST_SIZES else [pytest.mark.slow],
    )
    for name in sorted(DiffMa_models)
]


@pytest.mark.parametrize("name", _ZOO)
@pytest.mark.parametrize("scan_impl", ["auto", "fused"])
def test_zoo_entry_traces(name, scan_impl):
    if scan_impl == "fused" and name.startswith("DiT"):
        pytest.skip("DiT has no scan; scan_impl does not apply")
    size = _input_size(name)
    m = build_model(name, input_size=size, d_state=16, scan_impl=scan_impl)
    args = _args(size)
    variables = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), *args))
    out = jax.eval_shape(m.apply, variables, *args)
    C = 8 if m.learn_sigma else 4
    assert out.shape == (1, C, size, size)
    assert out.dtype == jnp.float32


@pytest.mark.slow
@pytest.mark.parametrize("family", FAMILIES)
def test_zoo_family_numeric_fwd_and_grad(family):
    """Registry-constructed S/2 entry per family: real forward + one grad
    step (loss = mean(out^2) after perturbing params so adaLN-zero does not
    hide the backbone)."""
    name = f"{family}-S/2"
    size = _input_size(name)
    m = build_model(name, input_size=size, d_state=16)
    args = _args(size)
    variables = m.init(jax.random.PRNGKey(0), *args)
    variables = jax.tree.map(
        lambda p: p
        + 0.02 * jax.random.normal(jax.random.PRNGKey(1), p.shape, p.dtype),
        variables,
    )
    out = m.apply(variables, *args)
    assert np.isfinite(np.asarray(out)).all()

    def loss_fn(v):
        return jnp.mean(jnp.square(m.apply(v, *args)))

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gradient actually reaches the backbone, not just the final layer
    gnorm = sum(float(jnp.sum(jnp.square(g))) for g in leaves)
    assert gnorm > 0.0


def test_zoo_odd_grid_emamba_raises():
    """EMamba on an odd token grid must fail loudly with the documented
    ValueError (input 14, patch 2 -> grid 7; the reference crashes on the
    same configs via shape mismatch)."""
    m = build_model("EMamba-S/2", input_size=14, d_state=16)
    args = _args(14)
    with pytest.raises(ValueError, match="even token grid"):
        jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), *args))
