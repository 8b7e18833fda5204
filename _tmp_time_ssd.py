import time, jax, jax.numpy as jnp, numpy as np
from diffma_tpu.diffusion import create_diffusion
from diffma_tpu.models.diffma import build_model
from diffma_tpu.train.train import synthetic_batch

BATCH, STEPS, latent, tokens = 8, 250, 28, 196
cond = synthetic_batch(jax.random.PRNGKey(0), BATCH, latent, tokens)
diffusion = create_diffusion(str(STEPS))

for impl in ("auto", "fused"):
    model = build_model("EMamba-B/2", input_size=latent, d_state=16,
                        dtype=jnp.bfloat16, use_mamba2=False, scan_impl=impl)
    params = model.init(jax.random.PRNGKey(1), cond["z"],
                        jnp.zeros((BATCH,), jnp.int32), cond["y"], cond["y2"], cond["w"])["params"]

    @jax.jit
    def sample(params, rng, z, y, y2, w):
        def model_fn(x, t, **kw):
            return model.apply({"params": params}, x, t, **kw).astype(jnp.float32)
        return diffusion.p_sample_loop(model_fn, z.shape, rng, noise=z,
                                       clip_denoised=False,
                                       model_kwargs={"y": y, "y2": y2, "w": w})
    z = jax.random.normal(jax.random.PRNGKey(4), (BATCH, 4, latent, latent))
    args = (params, jax.random.key(5, impl="rbg"), z, cond["y"], cond["y2"], cond["w"])
    np.asarray(sample(*args))
    t0 = time.time()
    for _ in range(3):
        out = sample(*args)
    np.asarray(out)
    dt = (time.time() - t0) / 3
    print(f"{impl}: {dt*1000/STEPS:.2f} ms/step, {BATCH/dt:.2f} img/s (no VAE)")
