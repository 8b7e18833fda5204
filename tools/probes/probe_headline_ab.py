"""A/B the Mamba2 sampling headline at the bench protocol shapes (VERDICT r4 #1a).

Times the exact bench.py Mamba2 protocol (DiffMa-B/2, 224^2 latents, 250-step
respaced DDPM chain + VAE decode, batch 8) over MANY timed windows and prints
per-window img/s plus median/min/max, so kernel-cost differences can be told
apart from tunnel variance.  Run it under each hatch:

    python tools/probes/probe_headline_ab.py                      # HEAD default
    DIFFMA_SSD_DECAY=quadratic python tools/probes/probe_headline_ab.py
    DIFFMA_SSD_DECAY=factored  python tools/probes/probe_headline_ab.py

(the hatch is read at diffma_tpu.ops.fused_ssd import time, hence one
process per setting).  Context: BENCH_r03 captured 10.975 img/s, BENCH_r04
9.659 — this probe answers whether the round-4 kernel rework (gate-off-
permutes + factored decay) costs at bs8 sampling shapes or whether a 3-rep
single window is simply too noisy an instrument.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8
STEPS = 250
WINDOWS = 7
REPS = 3


def _fetch(x):
    return np.asarray(jax.tree.leaves(x)[0])


def main():
    from diffma_tpu.diffusion import create_diffusion
    from diffma_tpu.models.diffma import build_model
    from diffma_tpu.models.vae import SD_VAE_SCALE, AutoencoderKL
    from diffma_tpu.train.train import synthetic_batch

    latent, tokens = 28, 196
    model = build_model(
        "DiffMa-B/2", input_size=latent, d_state=16, dtype=jnp.bfloat16,
        use_mamba2=True, scan_impl="fused",
    )
    cond = synthetic_batch(jax.random.PRNGKey(0), BATCH, latent, tokens)
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
    _fetch(sample(*args))  # compile + warm

    windows = []
    for _ in range(WINDOWS):
        t0 = time.time()
        out = None
        for _ in range(REPS):
            out = sample(*args)
        _fetch(out)
        windows.append(BATCH * REPS / (time.time() - t0))
    arr = np.asarray(windows)
    print(json.dumps({
        "decay_mode": os.environ.get("DIFFMA_SSD_DECAY", "(runtime dispatch)"),
        "windows_img_s": [round(w, 3) for w in windows],
        "median": round(float(np.median(arr)), 3),
        "min": round(float(arr.min()), 3),
        "max": round(float(arr.max()), 3),
        "spread_pct": round(100 * float(arr.max() - arr.min()) / float(np.median(arr)), 1),
    }))


if __name__ == "__main__":
    main()
