"""Where a Mamba2 (SSD) train step's time goes at bs>=64 (VERDICT r3 item #2).

The round-3 study measured Mamba2 train MFU = 16.5% (bs64) / 17.4% (bs128)
on the model-FLOP basis.  This probe decomposes the step to show what bounds
it, without xprof (device traces are unavailable through the axon tunnel):

  1. full train step (fwd + bwd + AdamW + EMA), the production path;
  2. loss forward alone (model fwd + diffusion loss);
  3. value_and_grad alone (no optimizer/EMA);
  4. the 16 fused dual-mixer calls alone, fwd and fwd+bwd, at exactly the
     step's stream shapes -- the Pallas-kernel share of the step;
  5. optimizer + EMA alone on the same param tree.

Each region is timed as a chained jit (outputs feed inputs, defeating CSE),
fetched with np.asarray (tunnel-safe), amortised over reps.  The report
prints ms and the share of the full step, plus executed-FLOP utilisation
for the kernel regions (counting permute/decay matmuls the formulation
adds, vs the 197 TF/s v5e peak).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffma_tpu.diffusion import create_diffusion
from diffma_tpu.models.diffma import build_model
from diffma_tpu.train.state import TrainState, make_train_step
from diffma_tpu.train.train import make_loss_fn, synthetic_batch
from diffma_tpu.utils.profiling import model_flops

LATENT, TOKENS = 28, 196
PEAK = 197e12
BATCH = 64
DEPTH = 8


def _fetch(x):
    return np.asarray(jax.tree.leaves(x)[0])


def _time(fn, *args, reps=10, warm=11):
    out = None
    for _ in range(warm):
        out = fn(*args)
    _fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return (time.time() - t0) / reps


def main():
    model = build_model(
        "DiffMa-B/2", input_size=LATENT, d_state=16, dtype=jnp.bfloat16,
        use_mamba2=True, scan_impl="fused",
    )
    cond = synthetic_batch(jax.random.PRNGKey(0), BATCH, LATENT, TOKENS)
    params = model.init(
        jax.random.PRNGKey(1), cond["z"], jnp.zeros((BATCH,), jnp.int32),
        cond["y"], cond["y2"], cond["w"],
    )["params"]
    diffusion = create_diffusion("")
    loss_fn = make_loss_fn(model, diffusion)
    opt = optax.adamw(1e-4, weight_decay=0.0)

    report = {}

    # 1. full production step
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(loss_fn, opt), donate_argnums=(0,))

    def run_step(state):
        s = state
        s, m = step(s, cond, jax.random.PRNGKey(7))
        return s, m

    # manual warm/timing because of donation
    s = state
    for i in range(11):
        s, m = step(s, cond, jax.random.fold_in(jax.random.PRNGKey(8), i))
    _fetch(m["loss"])
    t0 = time.time()
    for i in range(10):
        s, m = step(s, cond, jax.random.fold_in(jax.random.PRNGKey(9), i))
    _fetch(m["loss"])
    t_step = (time.time() - t0) / 10
    report["full_step_ms"] = round(1000 * t_step, 2)
    report["steps_per_s"] = round(1.0 / t_step, 2)
    flops_fwd = model_flops(depth=DEPTH, hidden=512, tokens=TOKENS)
    report["model_flop_mfu"] = round(3 * BATCH * flops_fwd / t_step / PEAK, 4)

    # rebuild params (donated)
    params = model.init(
        jax.random.PRNGKey(1), cond["z"], jnp.zeros((BATCH,), jnp.int32),
        cond["y"], cond["y2"], cond["w"],
    )["params"]

    # 2. loss forward alone (chained: rng folded per rep inside one jit)
    @jax.jit
    def fwd_chain(params, rng):
        def body(c, i):
            l, _ = loss_fn(params, cond, jax.random.fold_in(rng, i))
            return c + l, None

        out, _ = jax.lax.scan(body, 0.0, jnp.arange(4))
        return out

    t_fwd = _time(fwd_chain, params, jax.random.PRNGKey(3), reps=5) / 4
    report["loss_fwd_ms"] = round(1000 * t_fwd, 2)

    # 3. value_and_grad alone
    @jax.jit
    def vg(params, rng):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cond, rng
        )
        return l, g

    t_vg = _time(vg, params, jax.random.PRNGKey(3), reps=5)
    report["value_and_grad_ms"] = round(1000 * t_vg, 2)

    # 4. the fused dual-mixer kernels alone, exactly the step's shapes:
    #    DEPTH blocks x (2 mixers per spiral block) batched as one stacked
    #    call per block.
    from diffma_tpu.models.mamba2 import Mamba2
    from diffma_tpu.ops.fused_ssd import mamba2_dual_mixer_fused
    from diffma_tpu.ops.scan_orders import build_scan_spec

    mixer = Mamba2(d_model=512, d_state=16, dtype=jnp.bfloat16)
    spec0 = build_scan_spec("spiral", LATENT // 2, 0)
    x0 = jax.random.normal(
        jax.random.PRNGKey(5), (2, BATCH, TOKENS, 512), jnp.bfloat16
    )
    mp = mixer.init(jax.random.PRNGKey(6), x0[0], spec0)["params"]
    weights = tuple(
        jnp.stack([v, v])
        for v in (
            mp["in_proj"]["kernel"], mp["conv1d_weight"], mp["conv1d_bias"],
            mp["dt_bias"], mp["A_log"], mp["D"], mp["norm_weight"],
            mp["out_proj"]["kernel"],
        )
    )
    specs = [build_scan_spec("spiral", LATENT // 2, i) for i in range(DEPTH)]

    def mixers_fwd(x, weights):
        for i in range(DEPTH):
            x = mamba2_dual_mixer_fused(specs[i], x, *weights)
        return x

    # reduce to a SCALAR inside the jit: fetching the (2, B, L, h) output
    # itself would drag ~25 MB through the tunnel per timed window and
    # dominate the measurement (observed: 500 ms "fwd" vs 63 ms fwd+bwd)
    @jax.jit
    def mixers_fwd_scalar(x, weights):
        return jnp.sum(mixers_fwd(x, weights).astype(jnp.float32))

    t_mix_fwd = _time(mixers_fwd_scalar, x0, weights, reps=5)
    report["mixers_fwd_ms"] = round(1000 * t_mix_fwd, 2)

    @jax.jit
    def mixers_vg(x, weights):
        def f(x, weights):
            return jnp.sum(mixers_fwd(x, weights).astype(jnp.float32) ** 2)

        return jax.value_and_grad(f, argnums=(0, 1))(x, weights)

    t_mix_vg = _time(mixers_vg, x0, weights, reps=5)
    report["mixers_fwd_bwd_ms"] = round(1000 * t_mix_vg, 2)

    # executed-FLOP estimate per dual-mixer fwd call (both branches), at the
    # post-gate-commute kernel (the fan-out permute carries only the conv+dt
    # columns, the merge side un-permutes the pre-gate y; identity streams
    # pay no permutes).  Terms: in_proj + per-stream (fan-out permute +
    # cumsum tril + cb + per-head decay matmuls + merge un-permute) + out_proj.
    from diffma_tpu.ops.fused_mixer import _identity_streams

    L, dmod, d, n, H = TOKENS, 512, 1024, 16, 16
    conv_dim = d + 2 * n
    dproj = 2 * d + 2 * n + H
    ident = _identity_streams(spec0)
    per_mixer = 2 * L * dmod * dproj + 2 * L * d * dmod
    for s in range(len(ident)):
        per_mixer += 2 * L * L * H + 2 * L * L * n + 2 * L * L * d
        if not ident[s]:
            per_mixer += 2 * L * L * (conv_dim + H)  # fan-out permute
            per_mixer += 2 * L * L * d  # merge un-permute
    exec_flops_fwd = 2 * BATCH * DEPTH * per_mixer  # 2 branches
    report["mixers_exec_flops_fwd_tf"] = round(exec_flops_fwd / 1e12, 2)
    report["mixers_fwd_exec_util"] = round(
        exec_flops_fwd / t_mix_fwd / PEAK, 3
    )
    report["mixers_bwd_exec_util_approx"] = round(
        3 * exec_flops_fwd / t_mix_vg / PEAK, 3
    )

    # 5. optimizer + EMA alone
    from diffma_tpu.train.state import update_ema

    opt_state = opt.init(params)

    @jax.jit
    def opt_only(params, opt_state, ema):
        g = jax.tree.map(lambda p: p * 1e-6, params)
        updates, new_opt = opt.update(g, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, update_ema(ema, new_params)

    ema = jax.tree.map(jnp.copy, params)
    t_opt = _time(opt_only, params, opt_state, ema, reps=10)
    report["optimizer_ema_ms"] = round(1000 * t_opt, 2)

    # shares
    report["share_mixers_fwd_bwd"] = round(t_mix_vg / t_step, 3)
    report["share_glue_fwd_bwd"] = round(
        (t_vg - t_mix_vg) / t_step, 3
    )
    report["share_opt_ema"] = round(t_opt / t_step, 3)
    report["share_step_minus_vg"] = round((t_step - t_vg) / t_step, 3)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
