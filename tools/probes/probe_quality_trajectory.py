"""TPU quality trajectory: SSIM of DDIM-25 samples across training (VERDICT r4 #7).

The device-side analogue of tests/test_overfit.py at FULL B/2 width: train
the real ``train.main`` overfit harness (one fixed synthetic batch, bs8,
bf16, Mamba2) for N in {250, 1000, 2000} steps — three independent runs
that share the deterministic rng stream, so they are prefixes of one
trajectory — then DDIM-25-sample from each checkpoint's params with the
fixed batch's conditioning and report SSIM against the memorised target
latents.  The closest this container gets to the reference's "trained
models produce images" evidence (/root/reference/sample.py:112-115).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_quality_trajectory.py
Results recorded in BASELINE.md.
"""

import json
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from diffma_tpu.diffusion import create_diffusion
from diffma_tpu.models.diffma import build_model
from diffma_tpu.train.train import main, synthetic_batch
from diffma_tpu.utils.config import Config
from diffma_tpu.utils.metrics import ssim

SEED = 0
IMAGE_SIZE = 224
LATENT = IMAGE_SIZE // 8
TOKENS = (LATENT // 2) ** 2
BATCH = 8
CHECKPOINT_STEPS = (250, 1000, 2000)


def _cfg(steps: int):
    return Config(
        {
            "epochs": 10**6,
            "max_steps": steps,
            "log_every": 500,
            "ckpt_every": 10**9,
            "accumulation_steps": 1,
            "lr": 1e-4,
            "results_dir": tempfile.mkdtemp(prefix="diffma_traj_"),
            "model": "DiffMa-B/2",
            "image_size": IMAGE_SIZE,
            "global_batch_size": BATCH,
            "global_seed": SEED,
            "dt_rank": 16,
            "d_state": 16,
            "use_mamba2": True,
            "autocast": True,
            "synthetic_data": True,
            "synthetic_dataset_size": 64,
            "overfit_fixed_batch": True,
            "return_loss_history": True,
        }
    )


def main_():
    # exactly how main() builds the model for this cfg on TPU
    model = build_model(
        "DiffMa-B/2", input_size=LATENT, dt_rank=16, d_state=16,
        use_mamba2=True,
        scan_impl="fused" if jax.default_backend() == "tpu" else "auto",
        dtype=jnp.bfloat16,
    )
    # main(): overfit_fixed_batch uses PRNGKey(global_seed + 1)
    batch = synthetic_batch(
        jax.random.PRNGKey(SEED + 1), BATCH, LATENT, TOKENS, dim=512
    )
    target = np.asarray(batch["z"], np.float64)
    data_range = float(target.max() - target.min())
    diffusion = create_diffusion("ddim25")

    @jax.jit
    def sample(params):
        def model_fn(x, t, **kw):
            return model.apply({"params": params}, x, t, **kw).astype(jnp.float32)

        return diffusion.ddim_sample_loop(
            model_fn, (BATCH, 4, LATENT, LATENT), jax.random.PRNGKey(42),
            clip_denoised=False,
            model_kwargs={"y": batch["y"], "y2": batch["y2"], "w": batch["w"]},
        )

    # untrained reference point: main()'s init rng stream
    _, init_rng = jax.random.split(jax.random.PRNGKey(SEED))
    dummy = synthetic_batch(jax.random.PRNGKey(0), 2, LATENT, TOKENS, dim=512)
    params0 = model.init(
        init_rng, dummy["z"], jnp.zeros((2,), jnp.int32), dummy["y"],
        dummy["y2"], dummy["w"],
    )["params"]

    rows = [{
        "steps": 0,
        "ssim_vs_target": round(
            float(ssim(np.asarray(sample(params0)), target, data_range=data_range)), 4
        ),
        "mse_last20": None,
    }]
    for steps in CHECKPOINT_STEPS:
        state, hist = main(_cfg(steps))
        mse = np.asarray(hist["mse"], np.float64)
        s = float(
            ssim(np.asarray(sample(state.params)), target, data_range=data_range)
        )
        rows.append({
            "steps": steps,
            "ssim_vs_target": round(s, 4),
            "mse_last20": round(float(mse[-20:].mean()), 4),
        })
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"trajectory": rows}, indent=2))


if __name__ == "__main__":
    main_()
