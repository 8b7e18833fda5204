"""Golden + property tests for the static scan-order generators.

Goldens in tests/golden/scan_orders.npz were generated once from the
reference's pure-Python ``tools.py`` (spiral/zig/vmamba_) so these tables are
bit-identical to upstream without importing it at test time.
"""

import os

import numpy as np
import pytest

from diffma_tpu.ops import (
    atrous_streams,
    build_scan_spec,
    invert_permutation,
    spiral_orders,
    vmamba_orders,
    zig_order,
)

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden", "scan_orders.npz"))
SIZES = (4, 8, 14, 28)


@pytest.mark.parametrize("n", SIZES)
def test_spiral_matches_reference(n):
    orders, inv = spiral_orders(n)
    np.testing.assert_array_equal(orders, GOLDEN[f"spiral_{n}_orders"])
    np.testing.assert_array_equal(inv, GOLDEN[f"spiral_{n}_inv"])


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("i", range(16))
def test_zig_matches_reference(n, i):
    order, inv = zig_order(n, i)
    np.testing.assert_array_equal(order, GOLDEN[f"zig_{n}_{i}_order"])
    np.testing.assert_array_equal(inv, GOLDEN[f"zig_{n}_{i}_inv"])


@pytest.mark.parametrize("n", SIZES)
def test_vmamba_matches_reference(n):
    orders, inv = vmamba_orders(n)
    np.testing.assert_array_equal(orders, GOLDEN[f"vmamba_{n}_orders"])
    np.testing.assert_array_equal(inv, GOLDEN[f"vmamba_{n}_inv"])


@pytest.mark.parametrize("n", SIZES)
def test_orders_are_permutations_with_valid_inverses(n):
    orders, inv = spiral_orders(n)
    ident = np.arange(n * n)
    for o, q in zip(orders, inv):
        np.testing.assert_array_equal(np.sort(o), ident)
        np.testing.assert_array_equal(o[q], ident)
        np.testing.assert_array_equal(q[o], ident)
        np.testing.assert_array_equal(invert_permutation(o), q)


@pytest.mark.parametrize("n", (4, 8, 28))
def test_atrous_streams_partition_grid(n):
    s = atrous_streams(n)
    assert s.shape == (4, (n // 2) ** 2)
    np.testing.assert_array_equal(np.sort(s.reshape(-1)), np.arange(n * n))


def test_atrous_streams_match_reference_slicing():
    # Reproduce CrossScan_EfficientVMamba.forward's slicing on a token-index
    # grid (block/mamba.py:176-183) and compare.
    n = 8
    r = np.arange(n * n).reshape(n, n)
    expected = np.stack(
        [
            r[::2, ::2].reshape(-1),
            r.T[::2, 1::2].reshape(-1),
            r[::2, 1::2].reshape(-1),
            r.T[1::2, 1::2].reshape(-1),
        ]
    )
    np.testing.assert_array_equal(atrous_streams(n), expected)


@pytest.mark.parametrize(
    "block_type,n_streams,scale",
    [
        ("spiral", 3, 1.0),
        ("zig", 1, 1.0),
        ("vim", 2, 0.5),
        ("vmamba", 4, 1.0),
        ("efficientVMamba", 4, 1.0),
    ],
)
def test_scan_spec_roundtrip(block_type, n_streams, scale):
    """scatter-merge(gather-scan(x)) must reproduce x * (S * scale)."""
    n = 8
    for layer in (0, 1, 5, 9):
        spec = build_scan_spec(block_type, n, layer)
        assert spec.n_streams == n_streams
        assert spec.scale == scale
        x = np.random.default_rng(layer).normal(size=(n * n,))
        xs = x[spec.fwd]  # (S, Ls)
        merged = xs.reshape(-1)[spec.merge].sum(axis=1) * spec.scale
        multiplicity = spec.merge.shape[1]  # S for permutations, 1 for atrous
        np.testing.assert_allclose(merged, x * multiplicity * spec.scale)


def test_spiral_spec_merge_matches_reference_crossmerge():
    """Simulate CrossMerge.forward (block/mamba.py:61-69): y = ys0 +
    ys1[inv_order] + ys2[inv_order_rev] and compare against the merge table."""
    n = 8
    rng = np.random.default_rng(0)
    for layer in (0, 3, 7):
        spec = build_scan_spec("spiral", n, layer)
        orders, invs = spiral_orders(n)
        k = (2 * layer) % 16
        ys = rng.normal(size=(3, n * n))
        expected = ys[0] + ys[1][invs[k]] + ys[2][invs[k + 1]]
        merged = ys.reshape(-1)[spec.merge].sum(axis=1)
        np.testing.assert_allclose(merged, expected)


def test_spiral_layer_indexing_cycles_through_eight_walks():
    # model.py:147-150 indexes matrix_list[(2*i) % 16]: layers 0..7 hit the 8
    # distinct walks, layer 8 wraps back to layer 0's pair.
    n = 8
    s0 = build_scan_spec("spiral", n, 0)
    s8 = build_scan_spec("spiral", n, 8)
    np.testing.assert_array_equal(s0.fwd, s8.fwd)
    s1 = build_scan_spec("spiral", n, 1)
    assert not np.array_equal(s0.fwd[1], s1.fwd[1])
