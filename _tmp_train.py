import time, jax, jax.numpy as jnp, numpy as np, optax
from diffma_tpu.diffusion import create_diffusion
from diffma_tpu.models.diffma import build_model
from diffma_tpu.train.state import TrainState, make_train_step
from diffma_tpu.train.train import make_loss_fn, synthetic_batch

BATCH, latent, tokens = 8, 28, 196
cond = synthetic_batch(jax.random.PRNGKey(0), BATCH, latent, tokens)
diff = create_diffusion("")
for m2 in (False,):
    for impl in ("auto", "fused"):
        model = build_model("DiffMa-B/2", input_size=latent, d_state=16,
                            dtype=jnp.bfloat16, use_mamba2=m2, scan_impl=impl)
        params = model.init(jax.random.PRNGKey(1), cond["z"],
                            jnp.zeros((BATCH,), jnp.int32), cond["y"], cond["y2"], cond["w"])["params"]
        opt = optax.adamw(1e-4, weight_decay=0.0)
        state = TrainState.create(params, opt)
        step = jax.jit(make_train_step(make_loss_fn(model, diff), opt), donate_argnums=(0,))
        state, m = step(state, cond, jax.random.PRNGKey(6))
        np.asarray(m["loss"])
        t0 = time.time()
        for i in range(20):
            state, m = step(state, cond, jax.random.fold_in(jax.random.PRNGKey(7), i))
        np.asarray(m["loss"])
        dt = (time.time() - t0) / 20
        print(f"mamba2={m2} impl={impl}: {1/dt:.2f} steps/s")
