"""State-Space Duality (Mamba-2) chunked scan for TPU.

Replaces the Triton ``mamba_chunk_scan_combined`` /
``mamba_split_conv1d_scan_combined`` kernels the reference imports at
``block/mamba2.py:20-21`` and calls 16x per mixer forward
(``block/mamba2.py:392-696``).  The recurrence (spec: the reference's
pure-PyTorch decode fallback, block/mamba2.py:746-758) is, per head h with
scalar per-head decay:

    dt_t  = softplus(delta_t + dt_bias)              # scalar per head
    S_t   = exp(dt_t * A_h) * S_{t-1} + dt_t * (x_t (x) B_t)   # (P, N)
    y_t   = S_t @ C_t + D_h * x_t                    # (P,)

Because the decay is a *scalar per head* (unlike Mamba-1's per-channel,
per-state decay), the sequence can be blocked into chunks whose inner work is
dense matmuls -- exactly what the MXU wants:

    Y_intra[t] = sum_{s<=t} (C_t . B_s) exp(cs_t - cs_s) dt_s x_s
    S_chunk    = sum_s exp(cs_last - cs_s) dt_s (x_s (x) B_s)
    Y_inter[t] = C_t . (exp(cs_t) * S_entering)

with ``cs`` the inclusive within-chunk cumsum of dt*A.  The inter-chunk
recurrence runs over L/chunk steps only.  Everything is expressed in plain
JAX einsums (XLA tiles them onto the MXU); decays are computed in fp32.

``ssd_ref`` is the sequential ground truth used by the parity tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["ssd_chunked", "ssd_chunked_grouped", "ssd_ref", "ssd_state_update"]


def _contract_precision(dtype) -> lax.Precision:
    """Dtype-faithful MXU precision: fp32 inputs contract in true fp32
    (TPU default would silently round operands to bf16); bf16 training
    activations keep the fast single-pass MXU path."""
    return (
        lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else lax.Precision.DEFAULT
    )


def ssd_state_update(
    ssm_state: jax.Array,  # (G, H, P, N) fp32 carried state
    x: jax.Array,  # (G, H, P) post-conv token
    dt: jax.Array,  # (G, H) raw delta (pre-bias)
    A: jax.Array,  # (H,) negative
    B: jax.Array,  # (G, N)
    C: jax.Array,  # (G, N)
    D: jax.Array,  # (H,) or (H, P)
    dt_bias: Optional[jax.Array] = None,  # (H,)
    dt_softplus: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Single-token SSD update for incremental decode.

    TPU-native equivalent of the Triton ``selective_state_update`` call in
    ``Mamba2.step`` (block/mamba2.py:769-772); spec is the pure-torch fallback
    at block/mamba2.py:746-758.  Returns ``(y, new_state)``, fp32 state math.
    """
    out_dtype = x.dtype
    s = ssm_state.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    if dt_bias is not None:
        dtf = dtf + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dtf = jax.nn.softplus(dtf)
    prec = _contract_precision(out_dtype)
    dA = jnp.exp(dtf * A.astype(jnp.float32))  # (G, H)
    dBx = jnp.einsum("gh,gn,ghp->ghpn", dtf, B.astype(jnp.float32), xf,
                     precision=prec)
    s = dA[..., None, None] * s + dBx
    y = jnp.einsum("ghpn,gn->ghp", s, C.astype(jnp.float32), precision=prec)
    Df = D.astype(jnp.float32)
    y = y + (Df[:, None] if Df.ndim == 1 else Df) * xf
    return y.astype(out_dtype), s


def ssd_ref(
    x: jax.Array,  # (G, L, H, P)
    dt: jax.Array,  # (G, L, H)  -- raw, bias NOT added
    A: jax.Array,  # (H,)       -- negative
    B: jax.Array,  # (G, L, N)  -- ngroups=1
    C: jax.Array,  # (G, L, N)
    D: jax.Array,  # (H,) or (H, P)
    dt_bias: Optional[jax.Array] = None,  # (H,)
    dt_softplus: bool = True,
    dt_limit: tuple[float, float] = (0.0, float("inf")),
    initial_state: Optional[jax.Array] = None,  # (G, H, P, N)
    return_final_state: bool = False,
):
    """Sequential ground truth, fp32 state."""
    out_dtype = x.dtype
    x = x.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    dt = jnp.clip(dt, dt_limit[0], dt_limit[1])
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)
    G, L, H, P = x.shape
    N = B.shape[-1]
    prec = _contract_precision(out_dtype)

    def step(S, ins):
        x_t, dt_t, B_t, C_t = ins  # (G,H,P) (G,H) (G,N) (G,N)
        dA = jnp.exp(dt_t * A)  # (G, H)
        dBx = jnp.einsum("gh,gn,ghp->ghpn", dt_t, B_t, x_t, precision=prec)
        S = dA[..., None, None] * S + dBx
        y = jnp.einsum("ghpn,gn->ghp", S, C_t, precision=prec)
        return S, y

    S0 = (
        jnp.zeros((G, H, P, N), jnp.float32)
        if initial_state is None
        else initial_state.astype(jnp.float32)
    )
    ins = (
        jnp.moveaxis(x, 1, 0),
        jnp.moveaxis(dt, 1, 0),
        jnp.moveaxis(B, 1, 0),
        jnp.moveaxis(C, 1, 0),
    )
    S_final, ys = lax.scan(step, S0, ins)
    y = jnp.moveaxis(ys, 0, 1)  # (G, L, H, P)
    D = D.astype(jnp.float32)
    y = y + (D[:, None] if D.ndim == 1 else D) * x
    y = y.astype(out_dtype)
    return (y, S_final) if return_final_state else y


def ssd_chunked_grouped(
    x: jax.Array,  # (G, L, H, P)
    dt: jax.Array,  # (G, L, H)
    A: jax.Array,  # (H,)
    B: jax.Array,  # (G, L, ngroups*N)
    C: jax.Array,  # (G, L, ngroups*N)
    D: jax.Array,  # (H,) or (H, P)
    ngroups: int = 1,
    dt_bias: Optional[jax.Array] = None,
    initial_state: Optional[jax.Array] = None,  # (G, H, P, N)
    return_final_state: bool = False,
    **kw,
):
    """Multi-group SSD scan: head ``h`` reads B/C group ``h // (H/ngroups)``
    (the reference's grouped layout -- ``rearrange(B, "b l (g n) -> b l g n")``
    with contiguous head blocks per group, block/mamba2.py:764-765 and the
    Triton kernels' (b, l, g, n) convention).

    Groups fold into a vmapped leading axis over :func:`ssd_chunked`; the
    per-head tables (A, D, dt_bias) ride along as per-group slices, so the
    single-group kernel is reused unchanged.
    """
    if ngroups == 1:
        return ssd_chunked(
            x, dt, A, B, C, D, dt_bias=dt_bias, initial_state=initial_state,
            return_final_state=return_final_state, **kw,
        )
    G, L, H, P = x.shape
    g = ngroups
    Hg, rem = divmod(H, g)
    assert rem == 0, f"nheads {H} not divisible by ngroups {g}"
    xg = jnp.moveaxis(x.reshape(G, L, g, Hg, P), 2, 0)
    dtg = jnp.moveaxis(dt.reshape(G, L, g, Hg), 2, 0)
    Bg = jnp.moveaxis(B.reshape(G, L, g, -1), 2, 0)
    Cg = jnp.moveaxis(C.reshape(G, L, g, -1), 2, 0)
    Ag = A.reshape(g, Hg)
    Dg = D.reshape((g, Hg) if D.ndim == 1 else (g, Hg, D.shape[-1]))
    dbg = None if dt_bias is None else dt_bias.reshape(g, Hg)
    S0g = (
        None
        if initial_state is None
        else jnp.moveaxis(
            initial_state.reshape(G, g, Hg, *initial_state.shape[2:]), 1, 0
        )
    )

    def one_group(xx, dd, aa, bb, cc, ddd, bias, s0):
        return ssd_chunked(
            xx, dd, aa, bb, cc, ddd, dt_bias=bias, initial_state=s0,
            return_final_state=True, **kw,
        )

    y, S_final = jax.vmap(one_group)(xg, dtg, Ag, Bg, Cg, Dg, dbg, S0g)
    y = jnp.moveaxis(y, 0, 2).reshape(G, L, H, P)
    if return_final_state:
        S_final = jnp.moveaxis(S_final, 0, 1).reshape(
            G, H, *S_final.shape[3:]
        )
        return y, S_final
    return y


def _segsum_decay(cs: jax.Array) -> jax.Array:
    """Causal decay matrix exp(cs_t - cs_s) * (t >= s) from an inclusive
    cumsum, computed stably (exponent of a non-positive number)."""
    t = cs[..., :, None]  # (..., Q, 1)
    s = cs[..., None, :]  # (..., 1, Q)
    Q = cs.shape[-1]
    mask = jnp.tril(jnp.ones((Q, Q), bool))
    return jnp.where(mask, jnp.exp(t - s), 0.0)


def ssd_chunked(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
    dt_limit: tuple[float, float] = (0.0, float("inf")),
    chunk_size: int = 256,
    initial_state: Optional[jax.Array] = None,  # (G, H, P, N)
    return_final_state: bool = False,
):
    """Chunked SSD scan; matches ``ssd_ref`` with matmul-dominated work.

    Shapes as in ``ssd_ref``.  L is zero-padded to a multiple of the chunk
    (padded dt rows get -30 => decay 1, input 0, so they are inert).
    ``initial_state`` / ``return_final_state`` thread the (G, H, P, N) carry
    across sequence shards (the sequence-parallel handoff, see
    diffma_tpu.parallel.sequence).
    """
    out_dtype = x.dtype
    G, L0, H, P = x.shape
    N = B.shape[-1]
    Q = min(chunk_size, max(16, 1 << (L0 - 1).bit_length()))
    L = ((L0 + Q - 1) // Q) * Q
    if L != L0:
        pad = ((0, 0), (0, L - L0))
        x = jnp.pad(x, pad + ((0, 0), (0, 0)))
        dt = jnp.pad(dt, pad + ((0, 0),), constant_values=-30.0)
        B = jnp.pad(B, pad + ((0, 0),))
        C = jnp.pad(C, pad + ((0, 0),))
    nc = L // Q

    xf = x.astype(jnp.float32).reshape(G, nc, Q, H, P)
    dtf = dt.astype(jnp.float32)
    if dt_bias is not None:
        dtf = dtf + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dtf = jax.nn.softplus(dtf)
    dtf = jnp.clip(dtf, dt_limit[0], dt_limit[1]).reshape(G, nc, Q, H)
    Bf = B.astype(jnp.float32).reshape(G, nc, Q, N)
    Cf = C.astype(jnp.float32).reshape(G, nc, Q, N)

    dA = dtf * A.astype(jnp.float32)  # (G, nc, Q, H)
    cs = jnp.cumsum(dA, axis=2)  # inclusive within-chunk cumsum

    # ---- intra-chunk (dense, causal-masked matmuls) -----------------------
    prec = _contract_precision(out_dtype)
    cb = jnp.einsum("gctn,gcsn->gcts", Cf, Bf, precision=prec)  # (G, nc, Q, Q)
    decay = _segsum_decay(jnp.moveaxis(cs, -1, 2))  # (G, nc, H, Q, Q)
    m = cb[:, :, None] * decay  # (G, nc, H, Q, Q)
    xdt = xf * dtf[..., None]  # (G, nc, Q, H, P)
    y_intra = jnp.einsum("gchts,gcshp->gcthp", m, xdt, precision=prec)

    # ---- chunk states + inter-chunk recurrence ----------------------------
    cs_last = cs[:, :, -1]  # (G, nc, H): total chunk decay exponent
    state_decay = jnp.exp(cs_last[:, :, None] - cs)  # (G, nc, Q, H)
    S_chunk = jnp.einsum("gcqh,gcqn,gcqhp->gchpn", state_decay * dtf, Bf, xf,
                         precision=prec)

    def inter(Sprev, ins):
        S_c, dec = ins  # (G,H,P,N), (G,H)
        S_in = Sprev  # state entering this chunk
        S_out = dec[..., None, None] * Sprev + S_c
        return S_out, S_in

    S0 = (
        jnp.zeros((G, H, P, N), jnp.float32)
        if initial_state is None
        else initial_state.astype(jnp.float32)
    )
    S_final, S_in = lax.scan(
        inter,
        S0,
        (jnp.moveaxis(S_chunk, 1, 0), jnp.moveaxis(jnp.exp(cs_last), 1, 0)),
    )
    S_in = jnp.moveaxis(S_in, 0, 1)  # (G, nc, H, P, N)

    y_inter = jnp.einsum(
        "gcqh,gcqn,gchpn->gcqhp", jnp.exp(cs), Cf, S_in, precision=prec
    )

    y = (y_intra + y_inter).reshape(G, L, H, P)[:, :L0]
    Df = D.astype(jnp.float32)
    y = y + (Df[:, None] if Df.ndim == 1 else Df) * x.astype(jnp.float32)[:, :L0]
    y = y.astype(out_dtype)
    return (y, S_final) if return_final_state else y
