"""Sequence (context) parallelism for the SSD scan.

The reference carries a *latent* sequence-parallel mode in Mamba2 -- the
``sequence_parallel=True`` flag, the ``(b l) d`` flattening convention and the
``reduce_scatter`` epilogue (block/mamba2.py:260,276,359-372,708-710) -- that
no caller ever enables.  The TPU-native realisation shards the sequence axis
over a mesh axis with ``shard_map``:

1. every device runs the chunked SSD scan on its local sequence shard,
   returning its local outputs (computed with zero entering state), its
   final local state, and its shard's total per-head decay;
2. one ``all_gather`` of the tiny (H, P, N) shard summaries (the analogue of
   Mamba2's inter-chunk recurrence, one level up) lets each device compute
   the exclusive prefix -- the state *entering* its shard -- locally;
3. the entering-state contribution is added to the local outputs as
   ``C_t . (exp(cumdecay_t) * S_in)``, which is exactly the kernel's
   ``y_inter`` term evaluated at shard scope.

Communication per mixer: one all-gather of G*H*P*N floats per device over the
``sp`` axis -- independent of sequence length, riding ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from diffma_tpu.ops.ssd import ssd_chunked

__all__ = ["ssd_sequence_parallel", "selective_scan_sequence_parallel"]


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _sel_scan_local(u, delta, A, B, C, D, z, delta_softplus, axis):
    """Per-shard Mamba-1 scan body under shard_map.

    Uses the associative formulation: the scan over affine maps h -> a*h + b
    yields, at each t, the composed map (a_cum[t], h_local[t]) of the whole
    prefix -- so the shard's final element IS its summary, and the state
    entering the shard folds in as ``h[t] = h_local[t] + a_cum[t] * S_in``.
    One all-gather of (G, d, n) summaries; no sequential device chain.
    """
    uf = u.astype(jnp.float32)
    dt = delta.astype(jnp.float32)
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    Af = A.astype(jnp.float32)
    a = jnp.exp(dt[..., None] * Af)  # (G, Ls, d, n)
    b = (dt * uf)[..., None] * B.astype(jnp.float32)[:, :, None, :]

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    a_cum, h_local = jax.lax.associative_scan(combine, (a, b), axis=1)

    # Exclusive prefix of shard summaries (final composed map per shard):
    # compose the gathered maps inclusively, then take the (idx-1)-th.
    idx = jax.lax.axis_index(axis)
    a_all = jax.lax.all_gather(a_cum[:, -1], axis)  # (ndev, G, d, n)
    b_all = jax.lax.all_gather(h_local[:, -1], axis)
    _, b_inc = jax.lax.associative_scan(combine, (a_all, b_all), axis=0)
    prev = jnp.take(b_inc, jnp.maximum(idx - 1, 0), axis=0)
    S_in = jnp.where(idx > 0, prev, jnp.zeros_like(prev))

    h = h_local + a_cum * S_in[:, None]
    prec = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(u.dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    y = jnp.einsum("gldn,gln->gld", h, C.astype(jnp.float32), precision=prec)
    y = y + uf * D.astype(jnp.float32)
    if z is not None:
        y = y * _silu(z.astype(jnp.float32))
    return y.astype(u.dtype)


def selective_scan_sequence_parallel(
    u: jax.Array,  # (G, L, d) -- L divisible by mesh axis size
    delta: jax.Array,  # (G, L, d) raw (incl. dt bias)
    A: jax.Array,  # (d, n) negative
    B: jax.Array,  # (G, L, n)
    C: jax.Array,  # (G, L, n)
    D: jax.Array,  # (d,)
    mesh: Mesh,
    axis: str = "sp",
    z: Optional[jax.Array] = None,  # (G, L, d) gate
    delta_softplus: bool = True,
) -> jax.Array:
    """Mamba-1 selective scan with the sequence axis sharded over
    ``mesh[axis]``; matches ``selective_scan_ref`` on the full sequence."""
    body = partial(_sel_scan_local, delta_softplus=delta_softplus, axis=axis)
    seq = P(None, axis)
    rep = P()
    # jax.checkpoint keeps the linearization residuals to the primal inputs
    # (rematerialising the body on the backward pass), which both bounds CP
    # memory and sidesteps residual-sharding mismatches under shard_map.
    if z is None:
        fn = jax.shard_map(
            jax.checkpoint(lambda u, dt, B, C, A, D: body(u, dt, A, B, C, D, None)),
            mesh=mesh,
            in_specs=(seq, seq, seq, seq, rep, rep),
            out_specs=seq,
        )
        return fn(u, delta, B, C, A, D)
    fn = jax.shard_map(
        jax.checkpoint(lambda u, dt, B, C, z, A, D: body(u, dt, A, B, C, D, z)),
        mesh=mesh,
        in_specs=(seq, seq, seq, seq, seq, rep, rep),
        out_specs=seq,
    )
    return fn(u, delta, B, C, z, A, D)


def _seq_shard(arr, axis: str, nsp: int, dim: int = 1):
    """This shard's contiguous slice of a (replicated) sequence axis."""
    size = arr.shape[dim] // nsp
    idx = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(arr, idx * size, size, dim)


def _seq_unshard(arr, full_len: int, axis: str, dim: int = 1):
    """Scatter this shard's slice back into a zero full-length buffer.
    Different shards fill disjoint rows, so a later ``psum`` over ``axis``
    (typically fused with the out_proj reduction) reassembles the sequence
    without a dedicated all_gather."""
    idx = jax.lax.axis_index(axis)
    zeros = jnp.zeros(arr.shape[:dim] + (full_len,) + arr.shape[dim + 1:],
                      arr.dtype)
    return jax.lax.dynamic_update_slice_in_dim(
        zeros, arr, idx * arr.shape[dim], dim
    )


def _local_with_carry(x, dt, A, B, C, D, dt_bias, dt_softplus, dt_limit,
                      chunk_size, axis, varying_axes=None):
    """Body run per sequence shard under shard_map."""
    # Local scan with zero entering state; capture the local final state.
    # The explicit zero initial state must be marked device-varying so the
    # inner lax.scan carry types line up under shard_map.  When the caller
    # composes sp inside a tensor-parallel shard, the carry is varying over
    # BOTH manual axes (``varying_axes``).
    G, _, H, P = x.shape
    N = B.shape[-1]
    S0 = jax.lax.pcast(
        jnp.zeros((G, H, P, N), jnp.float32),
        tuple(varying_axes) if varying_axes is not None else (axis,),
        to="varying",
    )
    y_local, S_out = ssd_chunked(
        x, dt, A, B, C, D, dt_bias=dt_bias, dt_softplus=dt_softplus,
        dt_limit=dt_limit, chunk_size=chunk_size, initial_state=S0,
        return_final_state=True,
    )

    # Per-head decay exponent over the local shard and its running cumsum.
    dtf = dt.astype(jnp.float32)
    if dt_bias is not None:
        dtf = dtf + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dtf = jax.nn.softplus(dtf)
    dtf = jnp.clip(dtf, dt_limit[0], dt_limit[1])
    dA = dtf * A.astype(jnp.float32)  # (G, Ls, H)
    cum = jnp.cumsum(dA, axis=1)  # inclusive
    total = cum[:, -1]  # (G, H)

    # Exclusive prefix over shards: gather every shard's (S_out, total decay)
    # and fold left of this shard's index.
    idx = jax.lax.axis_index(axis)
    S_all = jax.lax.all_gather(S_out, axis)  # (ndev, G, H, P, N)
    dec_all = jax.lax.all_gather(jnp.exp(total), axis)  # (ndev, G, H)
    ndev = S_all.shape[0]

    def fold(carry, k):
        take = k < idx  # shards strictly before ours contribute
        dec = jnp.where(take, dec_all[k], 1.0)  # later shards: identity
        carry = dec[..., None, None] * carry + jnp.where(take, 1.0, 0.0) * S_all[k]
        return carry, None

    S_in, _ = jax.lax.scan(fold, jnp.zeros_like(S_out), jnp.arange(ndev))

    # Entering-state contribution: y_t += C_t . (exp(cum_t) * S_in).
    corr = jnp.einsum(
        "glh,gln,ghpn->glhp", jnp.exp(cum), C.astype(jnp.float32), S_in,
        precision=jax.lax.Precision.HIGHEST
        if jnp.dtype(x.dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT,
    )
    return (y_local.astype(jnp.float32) + corr).astype(x.dtype)


def ssd_sequence_parallel(
    x: jax.Array,  # (G, L, H, P) -- L divisible by mesh axis size
    dt: jax.Array,  # (G, L, H)
    A: jax.Array,  # (H,)
    B: jax.Array,  # (G, L, N)
    C: jax.Array,  # (G, L, N)
    D: jax.Array,  # (H,) or (H, P)
    mesh: Mesh,
    axis: str = "sp",
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
    dt_limit: tuple[float, float] = (0.0, float("inf")),
    chunk_size: int = 256,
) -> jax.Array:
    """SSD scan with the sequence axis sharded over ``mesh[axis]``.

    Matches ``ssd_ref`` on the full sequence; each device holds L/ndev
    tokens and exchanges one (G, H, P, N) state summary.
    """
    body = partial(
        _local_with_carry,
        dt_softplus=dt_softplus, dt_limit=dt_limit, chunk_size=chunk_size,
        axis=axis,
    )
    seq = P(None, axis)
    rep = P()
    fn = jax.shard_map(
        lambda x, dt, B, C, A, D, dt_bias: body(x, dt, A, B, C, D, dt_bias),
        mesh=mesh,
        in_specs=(seq, seq, seq, seq, rep, rep, rep),
        out_specs=seq,
    )
    return fn(x, dt, B, C, A, D, dt_bias)
