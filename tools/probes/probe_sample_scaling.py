"""Sampling batch-scaling study (VERDICT r3 item #3).

The training table proved batch 8 is latency-bound territory on one v5e;
this probe measures sampling CAPACITY: img/s/chip and analytic MFU for
bs 1/8/32/64 x {Mamba1, Mamba2} x {DDPM-250, DDIM-50} with the full
device pipeline (respaced chain + VAE decode), B/2 224^2 protocol shapes.

Reference protocol anchor: sample.py:84-115 runs a batch-1 host loop; the
batch-8 bench.py headline stays the protocol-faithful number -- this table
is the serving-capacity story.

Timing hygiene as in tools/probes/README.md: chained jitted loop, fetch
with np.asarray, reps amortised.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffma_tpu.diffusion import create_diffusion
from diffma_tpu.models.diffma import build_model
from diffma_tpu.models.vae import SD_VAE_SCALE, AutoencoderKL
from diffma_tpu.train.train import synthetic_batch
from diffma_tpu.utils.profiling import model_flops

LATENT, TOKENS = 28, 196
PEAK = 197e12  # v5e dense bf16


def _fetch(x):
    return np.asarray(jax.tree.leaves(x)[0])


def main():
    sampler_impl = "fused" if jax.default_backend() == "tpu" else "auto"
    vae = AutoencoderKL(dtype=jnp.bfloat16)
    vae_vars = vae.init(
        jax.random.PRNGKey(2), jax.random.PRNGKey(3), jnp.zeros((1, 3, 224, 224))
    )
    flops_fwd = model_flops(depth=8, hidden=512, tokens=TOKENS)
    results = []
    for use_mamba2 in (False, True):
        model = build_model(
            "DiffMa-B/2", input_size=LATENT, d_state=16, dtype=jnp.bfloat16,
            use_mamba2=use_mamba2, scan_impl=sampler_impl,
        )
        cond0 = synthetic_batch(jax.random.PRNGKey(0), 2, LATENT, TOKENS)
        params = model.init(
            jax.random.PRNGKey(1), cond0["z"], jnp.zeros((2,), jnp.int32),
            cond0["y"], cond0["y2"], cond0["w"],
        )["params"]
        for proto, steps in (("ddpm", 250), ("ddim", 50)):
            diffusion = create_diffusion(f"ddim{steps}" if proto == "ddim" else str(steps))
            loop = (
                diffusion.ddim_sample_loop if proto == "ddim"
                else diffusion.p_sample_loop
            )

            @jax.jit
            def sample(params, rng, z, y, y2, w, _loop=loop):
                def model_fn(x, t, **kw):
                    return model.apply(
                        {"params": params}, x, t, **kw
                    ).astype(jnp.float32)

                lat = _loop(
                    model_fn, z.shape, rng, noise=z, clip_denoised=False,
                    model_kwargs={"y": y, "y2": y2, "w": w},
                )
                return vae.apply(
                    vae_vars, lat / SD_VAE_SCALE, method=AutoencoderKL.decode
                )

            for bs in (1, 8, 32, 64):
                cond = synthetic_batch(jax.random.PRNGKey(0), bs, LATENT, TOKENS)
                z = jax.random.normal(
                    jax.random.PRNGKey(4), (bs, 4, LATENT, LATENT)
                )
                args = (params, jax.random.PRNGKey(5), z, cond["y"],
                        cond["y2"], cond["w"])
                reps = max(1, min(3, int(24 // max(1, bs // 8))))
                dt = None
                for attempt in range(3):  # tunnel hiccups are transient
                    try:
                        _fetch(sample(*args))  # compile + warm
                        t0 = time.time()
                        for _ in range(reps):
                            out = sample(*args)
                        _fetch(out)
                        dt = (time.time() - t0) / reps
                        break
                    except Exception as e:  # noqa: BLE001
                        print(json.dumps({
                            "backbone": "mamba2" if use_mamba2 else "mamba1",
                            "protocol": f"{proto}{steps}", "batch": bs,
                            "retry": attempt, "error": str(e)[:120],
                        }), flush=True)
                        time.sleep(10)
                if dt is None:
                    continue
                img_s = bs / dt
                mfu = steps * bs * flops_fwd / dt / PEAK
                row = {
                    "backbone": "mamba2" if use_mamba2 else "mamba1",
                    "protocol": f"{proto}{steps}",
                    "batch": bs,
                    "img_per_s": round(img_s, 2),
                    "ms_per_img": round(1000 * dt / bs, 2),
                    "mfu": round(mfu, 4),
                    "reps": reps,
                }
                results.append(row)
                print(json.dumps(row), flush=True)
    print(json.dumps({"table": results}))


if __name__ == "__main__":
    main()
