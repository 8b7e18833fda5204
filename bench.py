"""Headline benchmark: DiffMa-B/2 224^2 sampling throughput on one chip.

Prints ONE JSON line:
    {"metric": "images/sec/chip", "value": N, "unit": "img/s",
     "vs_baseline": R, ...aux fields...}

Protocol (matches BASELINE.json: "images/sec/chip (DiffMa-B/2, 224^2,
250-step DDPM); train steps/sec"):
  * DiffMa-B/2, 28x28x4 latents (224^2 images), learned-range sigma,
    250-step respaced DDPM chain via one jitted lax.scan, followed by the
    SD-VAE decode -- the full sample.py device pipeline.
  * value = batch / wall-time per sampling call, single chip.
  * vs_baseline divides by an estimated A100 reference throughput for the
    upstream implementation (A100_BASELINE_IMG_S below).  The reference
    publishes no numbers (README.md, .gitignore:23-31); its sampler runs 250
    sequential host-loop iterations of ~100 small CUDA kernel launches at
    batch 1 (sample.py:109, config brain.yaml sample_global_batch_size: 1),
    which bounds it to a few images/sec; 2.0 img/s is a deliberately
    generous estimate.  BASELINE.json's target is >=5x that.

Also measures train steps/sec (B/2, global batch 8) as an aux field.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_IMG_S = 2.0  # estimated upstream A100 sampling throughput
BATCH = 8
STEPS = 250


def main():
    import optax

    from diffma_tpu.diffusion import create_diffusion
    from diffma_tpu.models.diffma import build_model
    from diffma_tpu.models.vae import SD_VAE_SCALE, AutoencoderKL
    from diffma_tpu.train.state import TrainState, make_train_step
    from diffma_tpu.train.train import make_loss_fn, synthetic_batch

    latent, tokens = 28, 196
    # Inference uses the fully fused mixer kernel (conv+projections+scan+gate
    # in one Pallas call); training keeps the composable path below.
    sampler_impl = "fused" if jax.default_backend() == "tpu" else "auto"
    model = build_model(
        "DiffMa-B/2", input_size=latent, d_state=16, dtype=jnp.bfloat16,
        scan_impl=sampler_impl,
    )
    rng = jax.random.PRNGKey(0)
    cond = synthetic_batch(rng, BATCH, latent, tokens)
    params = model.init(
        jax.random.PRNGKey(1), cond["z"], jnp.zeros((BATCH,), jnp.int32),
        cond["y"], cond["y2"], cond["w"],
    )["params"]

    vae = AutoencoderKL(dtype=jnp.bfloat16)
    vae_vars = vae.init(
        jax.random.PRNGKey(2), jax.random.PRNGKey(3), jnp.zeros((1, 3, 224, 224))
    )

    diffusion = create_diffusion(str(STEPS))

    @jax.jit
    def sample(params, rng, z, y, y2, w):
        def model_fn(x, t, **kw):
            return model.apply({"params": params}, x, t, **kw).astype(jnp.float32)

        lat = diffusion.p_sample_loop(
            model_fn, z.shape, rng, noise=z, clip_denoised=False,
            model_kwargs={"y": y, "y2": y2, "w": w},
        )
        return vae.apply(vae_vars, lat / SD_VAE_SCALE, method=AutoencoderKL.decode)

    z = jax.random.normal(jax.random.PRNGKey(4), (BATCH, 4, latent, latent))
    args = (params, jax.random.PRNGKey(5), z, cond["y"], cond["y2"], cond["w"])
    sample(*args)[0].block_until_ready()  # compile
    t0 = time.time()
    reps = 3
    for i in range(reps):
        out = sample(*args)
    out.block_until_ready()
    sample_time = (time.time() - t0) / reps
    img_s = BATCH / sample_time

    # --- train steps/sec (aux) ------------------------------------------------
    model = build_model(
        "DiffMa-B/2", input_size=latent, d_state=16, dtype=jnp.bfloat16
    )
    params = model.init(
        jax.random.PRNGKey(1), cond["z"], jnp.zeros((BATCH,), jnp.int32),
        cond["y"], cond["y2"], cond["w"],
    )["params"]
    train_diff = create_diffusion("")
    optimizer = optax.adamw(1e-4, weight_decay=0.0)
    state = TrainState.create(params, optimizer)
    step = jax.jit(
        make_train_step(make_loss_fn(model, train_diff), optimizer),
        donate_argnums=(0,),
    )
    state, m = step(state, cond, jax.random.PRNGKey(6))
    jax.block_until_ready(m["loss"])
    t0 = time.time()
    reps_t = 10
    for i in range(reps_t):
        state, m = step(state, cond, jax.random.fold_in(jax.random.PRNGKey(7), i))
    jax.block_until_ready(m["loss"])
    steps_s = reps_t / (time.time() - t0)

    print(
        json.dumps(
            {
                "metric": "images/sec/chip (DiffMa-B/2, 224^2, 250-step DDPM)",
                "value": round(img_s, 3),
                "unit": "img/s",
                "vs_baseline": round(img_s / A100_BASELINE_IMG_S, 2),
                "train_steps_per_sec_bs8": round(steps_s, 3),
                "sample_batch": BATCH,
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
