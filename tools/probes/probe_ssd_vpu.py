"""Is the fused SSD kernel MXU-bound or VPU-bound? (VERDICT r3 item #2)

The kernel's non-matmul work is dominated by the per-head decay
construction: H x (L, L) `exp(cs_t - cs_s)` plus the mask add and the
`cb *` product -- transcendentals and elementwise ops on the VPU while
the MXU idles.  This probe times the production dual-mixer stack (the
exact shapes of a DiffMa-B/2 train step) fwd and fwd+bwd, then the user
re-runs it with ``DIFFMA_SSD_DECAY_SURROGATE=1`` which swaps the exp for
a 1-op masked multiply (wrong math, identical memory traffic and matmul
schedule).  The delta is the VPU-transcendental share of the kernel.

Run:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_ssd_vpu.py
    DIFFMA_SSD_DECAY_SURROGATE=1 PYTHONPATH=... python tools/probes/probe_ssd_vpu.py

Timing hygiene as in tools/probes/README.md (chained jit, np.asarray
fetch, amortised reps).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffma_tpu.ops.fused_ssd import _DECAY_SURROGATE, mamba2_dual_mixer_fused
from diffma_tpu.ops.scan_orders import build_scan_spec

LATENT, TOKENS = 28, 196
BATCH = int(os.environ.get("PROBE_BATCH", "64"))
DEPTH = 8


def _fetch(x):
    return np.asarray(jax.tree.leaves(x)[0])


def _time(fn, *args, reps=5, warm=6):
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
    from diffma_tpu.models.mamba2 import Mamba2

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

    @jax.jit
    def mixers_vg(x, weights):
        def f(x, weights):
            return jnp.sum(mixers_fwd(x, weights).astype(jnp.float32) ** 2)

        return jax.value_and_grad(f, argnums=(0, 1))(x, weights)

    t_fwd = _time(mixers_fwd_scalar, x0, weights)
    t_vg = _time(mixers_vg, x0, weights)
    print(json.dumps({
        "decay_surrogate": _DECAY_SURROGATE,
        "batch": BATCH,
        "depth_dual_mixer_calls": DEPTH,
        "mixers_fwd_ms": round(1000 * t_fwd, 2),
        "mixers_fwd_bwd_ms": round(1000 * t_vg, 2),
    }))


if __name__ == "__main__":
    main()
