"""A/B: whole-mixer fused SSD kernel vs a 'split' formulation.

Hypothesis: the fused kernel spends ~2/3 of its matmul FLOPs on work XLA
could do better OUTSIDE the kernel -- in_proj / out_proj batched over the
whole (branch, batch) grid at near-peak MXU efficiency, and the one-hot
permute matmuls replaced by free XLA gathers (permutation commutes with the
position-equivariant projections).  What stays in Pallas is only the SSD
core (conv -> dt -> cumsum -> decay-masked head matmuls -> gated norm),
whose decay tiles must live in VMEM.

Per mixer per batch element (B/2 shapes, spiral S=3 streams):
    fused kernel matmuls: in_proj 420MF + 2 permutes 644MF + core 257MF
                          + 2 merges 314MF + out_proj 205MF  = 1840MF
    split:  kernel core 257MF; XLA in_proj+out_proj 625MF (batched, big)

Prints ms per dual-mixer call (chained) for both, plus numeric deltas.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffma_tpu.ops.fused_ssd import _mdot, mamba2_dual_mixer_fused
from diffma_tpu.ops.scan_orders import build_scan_spec
from diffma_tpu.ops.selective_scan import _COMPILER_PARAMS, _interpret, _silu

B, grid_n, h = 8, 14, 512
d, n, H = 1024, 16, 16
hd = d // H
conv_dim = d + 2 * n
dproj = 2 * d + 2 * n + H
K = 4
L0 = grid_n * grid_n
spec = build_scan_spec("spiral", grid_n, 3)  # layer 3: non-identity orders
S = spec.fwd.shape[0]
N_CHAIN = 50


def _core_kernel(zx_ref, convw_ref, convb_ref, dtb_ref, A_ref, D_ref,
                 normw_ref, out_ref, xbcbuf, csbuf, ybuf,
                 *, L, eps, dt_lo, dt_hi, per_branch):
    i = pl.program_id(0)
    m = i // per_branch
    convw = convw_ref[m]
    convb, dtb, A = convb_ref[m], dtb_ref[m], A_ref[m]
    Dw, normw = D_ref[m], normw_ref[m]
    cd = zx_ref.dtype
    prec = (
        lax.Precision.HIGHEST if cd == jnp.float32 else lax.Precision.DEFAULT
    )

    xs = zx_ref[0]
    z = xs[:, :d]
    xbc_in = xs[:, d: d + conv_dim].astype(jnp.float32)
    dtraw = xs[:, d + conv_dim:].astype(jnp.float32)

    acc = xbc_in * convw[K - 1][None, :]
    for k in range(K - 1):
        sh = K - 1 - k
        shifted = jnp.concatenate(
            [jnp.zeros((sh, conv_dim), jnp.float32), xbc_in[: L - sh]], axis=0
        )
        acc = acc + shifted * convw[k][None, :]
    xbcbuf[...] = _silu(acc + convb[0][None, :])
    xssm = xbcbuf[:, :d]
    Bm = xbcbuf[:, d: d + n]
    Cm = xbcbuf[:, d + n:]

    dt = jax.nn.softplus(dtraw + dtb[0][None, :])
    if dt_lo > 0.0 or dt_hi != float("inf"):
        dt = jnp.clip(dt, dt_lo, dt_hi)

    row = lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tril = row >= col
    trilf = tril.astype(jnp.float32)
    neg = jnp.where(tril, 0.0, -1e30)
    erow = lax.broadcasted_iota(jnp.int32, (H, d), 0)
    ecol = lax.broadcasted_iota(jnp.int32, (H, d), 1) // hd
    E = (erow == ecol).astype(jnp.float32)
    D_exp = jnp.dot(
        Dw, E, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )

    dA = dt * A[0][None, :]
    csbuf[...] = _mdot(trilf, dA, cd)
    csT = jnp.transpose(csbuf[...])
    dt_exp = jnp.dot(dt, E, preferred_element_type=jnp.float32, precision=prec)
    xdt = xssm * dt_exp
    cb = lax.dot_general(
        Cm, Bm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    xdt_c = xdt.astype(cd)
    for hh in range(H):
        diff = csbuf[:, hh: hh + 1] - csT[hh: hh + 1, :] + neg
        mh = cb * jnp.exp(diff)
        ybuf[:, hh * hd:(hh + 1) * hd] = jnp.dot(
            mh.astype(cd), xdt_c[:, hh * hd:(hh + 1) * hd],
            preferred_element_type=jnp.float32, precision=prec,
        )
    y = ybuf[...] + D_exp * xssm
    zf = z.astype(jnp.float32)
    yg = y * _silu(zf)
    rms = lax.rsqrt(jnp.mean(jnp.square(yg), axis=-1, keepdims=True) + eps)
    out_ref[0] = (yg * rms * normw[0][None, :]).astype(out_ref.dtype)


def split_dual(x12, weights, eps=1e-5):
    in_w, conv_w, conv_b, dt_bias, A_log, D_, norm_w, out_w = weights
    M, B_, L0_, h_ = x12.shape
    L = ((L0_ + 7) // 8) * 8
    x = jnp.pad(x12, ((0, 0), (0, 0), (0, L - L0_), (0, 0))) if L != L0_ else x12
    cd = x.dtype
    A = -jnp.exp(A_log.astype(jnp.float32))
    zx = lax.dot_general(
        x, in_w.astype(cd), (((3,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(cd)  # (M, B, L, dproj)
    fwdpad = np.concatenate(
        [spec.fwd, np.broadcast_to(np.arange(L0_, L), (S, L - L0_))], axis=1
    )
    inv = np.empty((S, L), np.int32)
    for s in range(S):
        inv[s, fwdpad[s]] = np.arange(L)
    zxs = jnp.stack([jnp.take(zx, jnp.asarray(fwdpad[s]), axis=2)
                     for s in range(S)], axis=2)  # (M, B, S, L, dproj)
    G = M * B_ * S
    zxs = zxs.reshape(G, L, dproj)
    per_branch = B_ * S
    kern = functools.partial(
        _core_kernel, L=L, eps=eps, dt_lo=0.0, dt_hi=float("inf"),
        per_branch=per_branch,
    )
    wspecs = [
        pl.BlockSpec((M,) + s, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        for s in ((K, conv_dim), (1, conv_dim), (1, H), (1, H), (1, H), (1, d))
    ]
    yn = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, L, dproj), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=pl.BlockSpec((1, L, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, L, d), cd),
        scratch_shapes=[
            pltpu.VMEM((L, conv_dim), jnp.float32),
            pltpu.VMEM((L, H), jnp.float32),
            pltpu.VMEM((L, d), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(
        zxs,
        jnp.swapaxes(conv_w.astype(jnp.float32), -1, -2),
        conv_b.astype(jnp.float32)[:, None, :],
        dt_bias.astype(jnp.float32)[:, None, :],
        A[:, None, :],
        D_.astype(jnp.float32)[:, None, :],
        norm_w.astype(jnp.float32)[:, None, :],
    )
    yn = yn.reshape(M, B_, S, L, d)
    merged = sum(
        jnp.take(yn[:, :, s], jnp.asarray(inv[s]), axis=2).astype(jnp.float32)
        for s in range(S)
    )
    out = lax.dot_general(
        (merged * spec.scale).astype(cd), out_w.astype(cd),
        (((3,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    ).astype(cd)
    return out[:, :, :L0_]


def make_weights(key, dtype):
    ks = jax.random.split(key, 8)
    u = lambda k, s, sc: jax.random.normal(k, s, jnp.float32) * sc  # noqa
    return (
        u(ks[0], (2, h, dproj), 0.03).astype(dtype),
        u(ks[1], (2, conv_dim, K), 0.3),
        u(ks[2], (2, conv_dim), 0.1),
        u(ks[3], (2, H), 0.1),
        u(ks[4], (2, H), 0.5),  # A_log
        jnp.ones((2, H), jnp.float32),
        jnp.ones((2, d), jnp.float32),
        u(ks[7], (2, d, h), 0.03).astype(dtype),
    )


def timeit(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps


if __name__ == "__main__":
    for dtype in (jnp.bfloat16, jnp.float32):
        wts = make_weights(jax.random.PRNGKey(0), dtype)
        x12 = (jax.random.normal(jax.random.PRNGKey(1), (2, B, L0, h)) * 0.5
               ).astype(dtype)
        cur = mamba2_dual_mixer_fused(
            spec, x12, *wts, (0.0, float("inf")), 1e-5, 256
        )
        new = split_dual(x12, wts)
        ref = np.asarray(cur, np.float32)
        got = np.asarray(new, np.float32)
        denom = np.abs(ref).mean() + 1e-8
        print(f"[{np.dtype(jnp.dtype(dtype)).name}] mean|cur|={denom:.4f} "
              f"max|diff|={np.abs(ref-got).max():.5f} "
              f"rel={np.abs(ref-got).mean()/denom:.2e}")

        if jax.default_backend() == "tpu" and dtype == jnp.bfloat16:
            @jax.jit
            def chain_cur(wts, x):
                def step(xc, _):
                    o = mamba2_dual_mixer_fused(
                        spec, xc, *wts, (0.0, float("inf")), 1e-5, 256)
                    return (o * 1e-3 + xc).astype(xc.dtype), None
                xc, _ = lax.scan(step, x, None, length=N_CHAIN)
                return xc

            @jax.jit
            def chain_new(wts, x):
                def step(xc, _):
                    o = split_dual(xc, wts)
                    return (o * 1e-3 + xc).astype(xc.dtype), None
                xc, _ = lax.scan(step, x, None, length=N_CHAIN)
                return xc

            t_cur = timeit(chain_cur, wts, x12) / N_CHAIN
            t_new = timeit(chain_new, wts, x12) / N_CHAIN
            print(f"  chained dual-mixer: fused {t_cur*1e3:.3f} ms  "
                  f"split {t_new*1e3:.3f} ms  "
                  f"({t_cur/t_new:.2f}x)")
