"""Re-measure the Mamba2 train batch-scaling row after the round-4/5 kernels.

The round-3 study (BASELINE.md "Training batch-scaling study") predates the
gate-off-the-permutes layout (r4), the factored-decay backward work, and
the round-5 single-body default.  VERDICT r4 #3 asks for the bs>=64 rows to
be re-measured at HEAD.  Same methodology as round 3: full hybrid-loss
train step (fwd+bwd+AdamW+EMA) via the production ``make_train_step``,
10-step timed window after warm-up, MFU = 3*batch*model_flops/time/197TF.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_train_scaling.py
Optionally BATCHES=8,32,64,128 and DECAY via DIFFMA_SSD_DECAY.
Results recorded in BASELINE.md.
"""

import json
import os
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

LATENT, TOKENS, DEPTH = 28, 196, 8
PEAK = 197e12
BATCHES = tuple(
    int(b) for b in os.environ.get("BATCHES", "8,32,64,128").split(",")
)


def _fetch(x):
    return np.asarray(jax.tree.leaves(x)[0])


def main():
    model = build_model(
        "DiffMa-B/2", input_size=LATENT, d_state=16, dtype=jnp.bfloat16,
        use_mamba2=True, scan_impl="fused",
    )
    diffusion = create_diffusion("")
    loss_fn = make_loss_fn(model, diffusion)
    opt = optax.adamw(1e-4, weight_decay=0.0)
    flops_fwd = model_flops(depth=DEPTH, hidden=512, tokens=TOKENS)

    for batch in BATCHES:
        cond = synthetic_batch(jax.random.PRNGKey(0), batch, LATENT, TOKENS)
        params = model.init(
            jax.random.PRNGKey(1), cond["z"], jnp.zeros((batch,), jnp.int32),
            cond["y"], cond["y2"], cond["w"],
        )["params"]
        state = TrainState.create(params, opt)
        step = jax.jit(make_train_step(loss_fn, opt), donate_argnums=(0,))
        s = state
        for i in range(11):
            s, m = step(s, cond, jax.random.fold_in(jax.random.PRNGKey(8), i))
        _fetch(m["loss"])
        t0 = time.time()
        for i in range(10):
            s, m = step(s, cond, jax.random.fold_in(jax.random.PRNGKey(9), i))
        _fetch(m["loss"])
        t = (time.time() - t0) / 10
        print(json.dumps({
            "batch": batch,
            "steps_per_s": round(1.0 / t, 2),
            "img_per_s": round(batch / t, 1),
            "model_flop_mfu_pct": round(100 * 3 * batch * flops_fwd / t / PEAK, 1),
            "decay_mode": os.environ.get("DIFFMA_SSD_DECAY", "(default)"),
        }), flush=True)


if __name__ == "__main__":
    main()
