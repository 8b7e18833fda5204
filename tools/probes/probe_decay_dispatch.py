"""Isolate the runtime decay-dispatch overhead at bs8 sampling shapes.

probe_headline_ab measured (2026-08-20): auto dispatch 9.69 img/s vs forced
quadratic 12.58 on the full DDPM-250 chain — and a CPU estimate shows the
bench's INIT weights put every mixer's decay span at 85-322 log-units, far
above _SAFE_RANGE=60, so the auto kernel takes the QUADRATIC branch at
runtime.  The ~23%% must then be dispatch machinery, not the branch's math.
This probe times the 8-block fused dual-mixer forward stack (the kernel
region alone) at bs8 under four variants in ONE process:

  quad    : static quadratic kernel (single body);
  fact    : static factored kernel (single body);
  auto/un : dual-body kernel, unsafe inputs -> quadratic branch taken;
  auto/safe: dual-body kernel, near-zero dt (softplus(dt_bias-12)) ->
             span << 60 -> factored branch taken.

auto/un vs quad = dispatch overhead on the quadratic side;
auto/safe vs fact = dispatch overhead on the factored side;
fact vs quad = which static form wins at these shapes.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_decay_dispatch.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import diffma_tpu.ops.fused_ssd as fused_ssd
from diffma_tpu.models.mamba2 import Mamba2
from diffma_tpu.ops.scan_orders import build_scan_spec

LATENT, TOKENS, DEPTH, BATCH = 28, 196, 8, 8


def _fetch(x):
    return np.asarray(jax.tree.leaves(x)[0])


def _time(fn, *args, reps=10, warm=6):
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
    mixer = Mamba2(d_model=512, d_state=16, dtype=jnp.bfloat16)
    spec0 = build_scan_spec("spiral", LATENT // 2, 0)
    specs = [build_scan_spec("spiral", LATENT // 2, i) for i in range(DEPTH)]
    x0 = jax.random.normal(
        jax.random.PRNGKey(5), (2, BATCH, TOKENS, 512), jnp.bfloat16
    )
    x64 = jax.random.normal(
        jax.random.PRNGKey(5), (2, 64, TOKENS, 512), jnp.bfloat16
    )
    mp = mixer.init(jax.random.PRNGKey(6), x0[0], spec0)["params"]

    def stack_weights(dt_shift=0.0):
        return tuple(
            jnp.stack([v, v])
            for v in (
                mp["in_proj"]["kernel"], mp["conv1d_weight"], mp["conv1d_bias"],
                mp["dt_bias"] + dt_shift, mp["A_log"], mp["D"],
                mp["norm_weight"], mp["out_proj"]["kernel"],
            )
        )

    w_unsafe = stack_weights()           # span 85-322 at init (CPU estimate)
    w_safe = stack_weights(-12.0)        # softplus(~-12) ~ 6e-6 -> span ~ 0

    report = {}
    for label, mode, weights, xin in (
        ("static_quadratic", "quadratic", w_unsafe, x0),
        ("static_factored", "factored", w_unsafe, x0),
        ("auto_quadratic_branch", "auto", w_unsafe, x0),
        ("auto_factored_branch", "auto", w_safe, x0),
        # bs64 pair: if the auto overhead shrinks with batch it is a
        # per-LAUNCH cost (program/IMEM churn), not per-grid-cell
        ("static_quadratic_bs64", "quadratic", w_unsafe, x64),
        ("auto_quadratic_branch_bs64", "auto", w_unsafe, x64),
    ):
        fused_ssd._static_decay_mode = lambda m=mode: m

        @jax.jit
        def mixers_fwd(x, weights):
            for i in range(DEPTH):
                x = fused_ssd.mamba2_dual_mixer_fused(specs[i], x, *weights)
            return jnp.sum(x.astype(jnp.float32))

        t = _time(mixers_fwd, xin, weights)
        report[label] = round(1000 * t, 3)
        print(json.dumps({label: report[label]}), flush=True)

    q, a = report["static_quadratic"], report["auto_quadratic_branch"]
    f, af = report["static_factored"], report["auto_factored_branch"]
    q64, a64 = report["static_quadratic_bs64"], report["auto_quadratic_branch_bs64"]
    print(json.dumps({
        "dispatch_overhead_quadratic_side_pct": round(100 * (a - q) / q, 1),
        "dispatch_overhead_factored_side_pct": round(100 * (af - f) / f, 1),
        "factored_vs_quadratic_static_pct": round(100 * (f - q) / q, 1),
        "dispatch_overhead_quadratic_bs64_pct": round(100 * (a64 - q64) / q64, 1),
    }, indent=2))


if __name__ == "__main__":
    main()
