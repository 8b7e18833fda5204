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

__all__ = ["ssd_sequence_parallel"]


def _local_with_carry(x, dt, A, B, C, D, dt_bias, dt_softplus, dt_limit,
                      chunk_size, axis):
    """Body run per sequence shard under shard_map."""
    # Local scan with zero entering state; capture the local final state.
    # The explicit zero initial state must be marked device-varying so the
    # inner lax.scan carry types line up under shard_map.
    G, _, H, P = x.shape
    N = B.shape[-1]
    S0 = jax.lax.pcast(
        jnp.zeros((G, H, P, N), jnp.float32), (axis,), to="varying"
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
