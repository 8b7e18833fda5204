"""A/B the Mamba1 fused-mixer backward: monolithic kernel vs decomposed VJP.

Env DIFFMA_MIXER_BWD picks the path; this script times both at bs8 and
bs64 (B/2 protocol shapes).
"""
import os
import time

import jax, jax.numpy as jnp, numpy as np
import optax
from diffma_tpu.models.diffma import build_model
from diffma_tpu.diffusion import create_diffusion
from diffma_tpu.train.train import make_loss_fn, synthetic_batch
from diffma_tpu.train.state import TrainState, make_train_step

latent, tokens = 28, 196
model = build_model("DiffMa-B/2", input_size=latent, d_state=16,
                    dtype=jnp.bfloat16, scan_impl="fused")
diffusion = create_diffusion("")
opt = optax.adamw(1e-4, weight_decay=0.0)

for BATCH in (8, 64):
    cond = synthetic_batch(jax.random.PRNGKey(0), BATCH, latent, tokens)
    for mode in ("monolithic", "decomposed"):
        os.environ["DIFFMA_MIXER_BWD"] = mode
        # re-init per mode: the donated train step consumes the buffers that
        # TrainState.create aliases from params
        params = model.init(jax.random.PRNGKey(1), cond["z"],
                            jnp.zeros((BATCH,), jnp.int32), cond["y"],
                            cond["y2"], cond["w"])["params"]
        state = TrainState.create(params, opt)
        step = jax.jit(
            make_train_step(make_loss_fn(model, diffusion), opt),
            donate_argnums=(0,),
        )
        for i in range(11):
            state, m = step(state, cond,
                            jax.random.fold_in(jax.random.PRNGKey(8), i))
        np.asarray(m["loss"])
        t0 = time.time()
        for i in range(10):
            state, m = step(state, cond,
                            jax.random.fold_in(jax.random.PRNGKey(9), i))
        loss = float(np.asarray(m["loss"]))
        dt = (time.time() - t0) / 10
        print(f"bs{BATCH} {mode}: {1.0/dt:.2f} steps/s "
              f"({BATCH/dt:.1f} img/s), loss={loss:.4f}", flush=True)
