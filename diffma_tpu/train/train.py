"""DiffMa training pipeline (TPU-native re-design of train.py).

Usage (CLI-compatible with the reference):

    python -m diffma_tpu.train.train --config configs/brain.yaml \
        [--wandb] [--autocast] [--use-mamba2]

Differences from the reference runtime, same capabilities:

* torchrun/NCCL/DDP/DistributedSampler -> ``jax.distributed`` + a
  ('dp','tp') mesh; gradient averaging and loss reduction are XLA psums.
* GradScaler/autocast -> bf16 compute dtype (``--autocast``); no loss
  scaling is needed for bf16 on TPU; fp32 islands live inside the modules.
* The conditioning stack (SD-VAE, BiomedCLIP, CT encoder) runs as one jitted
  frozen function; the CT encoder loads the shipped torch checkpoint via the
  importer.  VAE/CLIP weights import from local files when configured
  (``vae_ckpt`` / ``clip_ckpt``); with no weights available the pipeline
  falls back to random frozen encoders (flagged loudly) or fully synthetic
  batches (``synthetic_data: true``), so training runs end-to-end anywhere.
* Checkpoints {params, ema, opt_state, step, config} go through Orbax every
  ``ckpt_every`` steps (logical layout of train.py:290-303).
"""

from __future__ import annotations

import argparse
import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffma_tpu.data import NpyDataset, SyntheticTriplets, make_loader, transform_train
from diffma_tpu.diffusion import create_diffusion
from diffma_tpu.models.clip_vit import biomedclip_vit_b16
from diffma_tpu.models.ct_encoder import CTEncoder
from diffma_tpu.models.diffma import build_model
from diffma_tpu.models.vae import SD_VAE_SCALE, AutoencoderKL
from diffma_tpu.parallel import make_mesh, shard_batch, shard_params
from diffma_tpu.train.checkpoints import load_diffma_params, save_checkpoint
from diffma_tpu.train.state import TrainState, make_train_step
from diffma_tpu.utils.config import parse_cli
from diffma_tpu.utils.logging import WandbShim, create_experiment_dir, create_logger
from diffma_tpu.utils.profiling import StepProfiler, Throughput
from diffma_tpu.utils.torch_io import (
    clip_vision_params_from_torch,
    ct_encoder_params_from_torch,
    load_torch_checkpoint,
    vae_params_from_torch,
)

__all__ = ["main", "build_conditioning", "make_loss_fn"]


def _maybe_distributed():
    """Multi-process runtime init (the torchrun analogue, README.md:84-97).

    Launch each process with
        DIFFMA_NUM_PROCESSES=<n> DIFFMA_PROCESS_ID=<i>
        [DIFFMA_COORDINATOR=host:port]
    (tools/run_multiprocess_smoke.py does this end-to-end on CPU).  On
    cluster schedulers that jax auto-detects (SLURM, OMPI), setting only
    DIFFMA_NUM_PROCESSES defers to ``jax.distributed.initialize()``'s own
    discovery."""
    n = int(os.environ.get("DIFFMA_NUM_PROCESSES", "1"))
    if n <= 1 or jax.distributed.is_initialized():
        return
    if "DIFFMA_PROCESS_ID" in os.environ:
        jax.distributed.initialize(
            coordinator_address=os.environ.get(
                "DIFFMA_COORDINATOR", "localhost:12321"
            ),
            num_processes=n,
            process_id=int(os.environ["DIFFMA_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()


def _renorm_to_unit(z):
    """Reference guard: min-max renormalise to [-1,1] if out of range
    (train.py:236-237)."""
    inside = jnp.all((z >= -1) & (z <= 1))
    span = jnp.maximum(z.max() - z.min(), 1e-8)
    renormed = (z - z.min()) / span * 2.0 - 1.0
    return jnp.where(inside, z, renormed)


class Conditioning:
    """Frozen VAE + CLIP + CT-encoder conditioning stack (train.py:156-177,
    235-241), as one jitted function."""

    def __init__(self, cfg, logger, rng):
        self.latent = cfg.image_size // 8
        patch = int(str(cfg.model)[-1])
        self.vae = AutoencoderKL()
        self.clip = biomedclip_vit_b16()
        self.ct = CTEncoder(
            img_size=self.latent, patch_size=patch, in_channels=4, embed_dim=512,
            contain_mask_token=True,
        )
        r1, r2, r3 = jax.random.split(rng, 3)
        dummy_img = jnp.zeros((1, 3, cfg.image_size, cfg.image_size))
        dummy_lat = jnp.zeros((1, 4, self.latent, self.latent))

        def load_or_init(name, path, module, init_args, converter=None):
            if path and os.path.exists(path):
                logger.info(f"{name}: importing weights from {path}")
                if converter is not None and str(path).endswith(
                    (".pt", ".pth", ".bin", ".ckpt")
                ):
                    return converter(path)
                return np.load(path, allow_pickle=True).item()
            logger.info(
                f"{name}: no local weights found ({path!r}); using random "
                f"frozen init -- supply a checkpoint for real data runs"
            )
            return module.init(*init_args)

        def ct_converter(path):
            sd = load_torch_checkpoint(path)
            sd = sd.get(cfg.get("load_ckpt_type", "ema"), sd.get("ema", sd))
            return jax.tree.map(jnp.asarray, ct_encoder_params_from_torch(sd))

        def vae_converter(path):
            sd = load_torch_checkpoint(path)
            sd = sd.get("state_dict", sd)
            return jax.tree.map(jnp.asarray, vae_params_from_torch(sd))

        def clip_converter(path):
            sd = load_torch_checkpoint(path)
            sd = sd.get("state_dict", sd)
            return jax.tree.map(jnp.asarray, clip_vision_params_from_torch(sd))

        self.vae_vars = load_or_init(
            "sd-vae", cfg.get("vae_ckpt"), self.vae, (r1, r2, dummy_img),
            converter=vae_converter,
        )
        self.clip_vars = load_or_init(
            "biomedclip", cfg.get("clip_ckpt"), self.clip, (r2, dummy_img),
            converter=clip_converter,
        )
        self.ct_vars = load_or_init(
            "ct-encoder", cfg.get("ct_ckpt"), self.ct,
            (r3, dummy_lat), converter=ct_converter,
        )

        @jax.jit
        def encode(rng, x_ct, z_mri):
            # x_ct/z_mri: (B, 3, H, W) images in model range
            z_mri = _renorm_to_unit(z_mri)
            k1, k2 = jax.random.split(rng)
            z = self.vae.apply(
                self.vae_vars, k1, z_mri, method=AutoencoderKL.encode_sample
            )
            x_lat = self.vae.apply(
                self.vae_vars, k2, x_ct, method=AutoencoderKL.encode_sample
            )
            w, y2 = self.ct.apply(self.ct_vars, x_lat)
            y = self.clip.apply(self.clip_vars, x_ct)
            return {"z": z, "y": y, "y2": y2, "w": w}

        self.encode = encode

    def __call__(self, rng, x_ct, z_mri):
        return self.encode(rng, jnp.asarray(x_ct), jnp.asarray(z_mri))


def synthetic_batch(rng, batch_size, latent, tokens, dim=512):
    ks = jax.random.split(rng, 4)
    return {
        "z": jax.random.normal(ks[0], (batch_size, 4, latent, latent)),
        "y": jax.random.normal(ks[1], (batch_size, dim)),
        "y2": jax.random.normal(ks[2], (batch_size, tokens, dim)),
        "w": jax.nn.sigmoid(jax.random.normal(ks[3], (batch_size, tokens, 1))),
    }


def make_loss_fn(model, diffusion):
    def loss_fn(params, batch, rng):
        t_rng, noise_rng = jax.random.split(rng)
        B = batch["z"].shape[0]
        t = jax.random.randint(t_rng, (B,), 0, diffusion.num_timesteps)

        def model_fn(x, tt, **kw):
            return model.apply({"params": params}, x, tt, **kw).astype(jnp.float32)

        terms = diffusion.training_losses(
            model_fn, batch["z"].astype(jnp.float32), t, noise_rng,
            model_kwargs={"y": batch["y"], "y2": batch["y2"], "w": batch["w"]},
        )
        aux = {k: v.mean() for k, v in terms.items() if k != "loss"}
        return terms["loss"].mean(), aux

    return loss_fn


def main(cfg) -> Optional[TrainState]:
    _maybe_distributed()
    rank = jax.process_index()
    rng = jax.random.PRNGKey(int(cfg.get("global_seed", 0)))

    if rank == 0:
        exp_dir = create_experiment_dir(cfg.results_dir, str(cfg.model))
        logger = create_logger(exp_dir, rank)
        logger.info(f"Experiment directory created at {exp_dir}")
    else:
        exp_dir = None
        logger = create_logger(None, rank)
    if jax.process_count() > 1:
        # Every process needs rank 0's experiment dir: Orbax checkpoint
        # saves are collective and must receive one consistent path.
        from jax.experimental import multihost_utils

        buf = np.zeros(512, np.uint8)
        if rank == 0:
            raw = os.path.abspath(exp_dir).encode()
            assert len(raw) <= buf.size, "experiment path too long to broadcast"
            buf[: len(raw)] = np.frombuffer(raw, np.uint8)
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        exp_dir = bytes(buf[buf != 0]).decode()
    wandb = WandbShim(bool(cfg.get("wandb")), str(cfg.model).replace("/", "_"))

    assert cfg.image_size % 8 == 0, "Image size must be divisible by 8 (VAE)."
    latent = cfg.image_size // 8
    dtype = jnp.bfloat16 if cfg.get("autocast") else jnp.float32
    tp, sp = int(cfg.get("tp", 1)), int(cfg.get("sp", 1))
    mesh = make_mesh(tp=tp, sp=sp)
    model = build_model(
        str(cfg.model),
        input_size=latent,
        dt_rank=int(cfg.get("dt_rank", 16)),
        d_state=int(cfg.get("d_state", 16)),
        use_mamba2=bool(cfg.get("use_mamba2", False)),
        # whole-block fused Pallas kernels win training too (decomposed
        # Pallas-adjoint VJPs); modules fall back per-spec when ineligible
        scan_impl=str(
            cfg.get(
                "scan_impl",
                "fused"
                if (jax.default_backend() == "tpu" and tp == 1 and sp == 1)
                else "auto",
            )
        ),
        remat=bool(cfg.get("remat", False)),
        mesh=mesh if (tp > 1 or sp > 1) else None,
        tp_axis="tp" if tp > 1 else None,
        sp_axis="sp" if sp > 1 else None,
        dtype=dtype,
        # optional width override (tests / scaling studies); registry
        # entries default to the reference's hidden_size=512
        **(
            {"hidden_size": int(cfg.hidden_size)}
            if cfg.get("hidden_size")
            else {}
        ),
    )
    diffusion = create_diffusion("")
    tokens = (latent // model.patch_size) ** 2

    # --- init / resume ------------------------------------------------------
    rng, init_rng = jax.random.split(rng)
    dummy = synthetic_batch(
        jax.random.PRNGKey(0), 2, latent, tokens, dim=model.hidden_size
    )
    params = model.init(
        init_rng, dummy["z"], jnp.zeros((2,), jnp.int32), dummy["y"], dummy["y2"],
        dummy["w"],
    )["params"]
    if cfg.get("init_from_pretrain_ckpt"):
        loaded = load_diffma_params(str(cfg.pretrain_ckpt_path), model, "model")
        params = jax.tree.map(jnp.asarray, loaded)
        logger.info(f"Loaded pretrain model from {cfg.pretrain_ckpt_path}")
        lr = float(cfg.get("lr_", cfg.lr))
        start_step = int(cfg.get("init_train_steps", 0))
    else:
        lr = float(cfg.lr)
        start_step = 0

    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info(f"DiffMa Parameters: {n_params:,}")
    logger.info(f"Use bf16 training? {bool(cfg.get('autocast'))}")

    optimizer = optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=0.0)
    state = TrainState.create(shard_params(params, mesh), optimizer)
    state = state.replace(step=jnp.asarray(start_step, jnp.int32))

    resume_fast_forward = 0
    if cfg.get("resume_from"):
        # Warm restart from our own Orbax checkpoints: restore params + EMA +
        # optimizer state and continue counting from the saved step.  (The
        # reference's only restart path reloads model/ema pickles without
        # optimizer state, train.py:137-151; this is the full-fidelity
        # version its Orbax layout enables.)  Restore is read-only, so every
        # process restores independently -- no collective needed (the SAVE
        # is the collective side).
        from diffma_tpu.train.checkpoints import latest_step, restore_checkpoint

        resume_dir = str(cfg.resume_from)
        r_step = int(cfg.get("resume_step") or latest_step(resume_dir))
        target = {
            "model": jax.device_get(state.params),
            "ema": jax.device_get(state.ema_params),
            "opt": jax.device_get(state.opt_state),
        }
        restored = restore_checkpoint(resume_dir, r_step, target=target)
        state = state.replace(
            params=shard_params(
                jax.tree.map(jnp.asarray, restored["model"]), mesh
            ),
            ema_params=shard_params(
                jax.tree.map(jnp.asarray, restored["ema"]), mesh
            ),
            opt_state=shard_params(
                jax.tree.map(jnp.asarray, restored["opt"]), mesh
            ),
            step=jnp.asarray(r_step, jnp.int32),
        )
        start_step = r_step
        # Replay the per-step rng splits so a resumed synthetic run continues
        # the exact stream an uninterrupted run would use (real-data runs
        # restart the loader like the reference's restart does).
        resume_fast_forward = r_step
        logger.info(f"Resumed from {resume_dir} at step {r_step}")

    loss_fn = make_loss_fn(model, diffusion)
    train_step = jax.jit(
        make_train_step(
            loss_fn, optimizer,
            accumulation_steps=int(cfg.get("accumulation_steps", 1)),
        ),
        donate_argnums=(0,),
    )

    # --- data + conditioning --------------------------------------------------
    synthetic = bool(cfg.get("synthetic_data", False))
    folders = (
        cfg.get("ct_image_folder_train"),
        cfg.get("mask_image_folder_train"),
        cfg.get("mir_image_folder_train"),
    )
    if not synthetic and not all(f and os.path.isdir(f) for f in folders):
        logger.info("dataset folders unavailable; falling back to synthetic data")
        synthetic = True

    cond = None
    if not synthetic:
        rng, cond_rng = jax.random.split(rng)
        cond = Conditioning(cfg, logger, cond_rng)
        try:
            from diffma_tpu.data.native import NativeTripletLoader

            dataset = NativeTripletLoader(*folders, size=int(cfg.image_size))
            logger.info("using native C++ triplet loader")
        except Exception:
            dataset = NpyDataset(*folders, transform=transform_train)
        logger.info(f"Dataset contains {len(dataset)}.")
    else:
        dataset = SyntheticTriplets(
            n=int(cfg.get("synthetic_dataset_size", 64)), size=cfg.image_size
        )

    global_batch = int(cfg.global_batch_size)
    assert global_batch % jax.process_count() == 0
    host_batch = global_batch // jax.process_count()

    # Seeded-overfit harness: with ``overfit_fixed_batch: true`` the synthetic
    # path feeds the SAME deterministic batch every step (latents + per-sample
    # conditioning from one fixed key), so training must memorise it -- the
    # end-to-end "does the optimizer wiring learn?" proof
    # (tests/test_overfit.py).  Everything else (loss, train_step, EMA,
    # NaN-skip, sharding) is the production path.
    fixed_batch = None
    if synthetic and bool(cfg.get("overfit_fixed_batch", False)):
        fixed_batch = synthetic_batch(
            jax.random.PRNGKey(int(cfg.get("global_seed", 0)) + 1),
            host_batch, latent, tokens, dim=model.hidden_size,
        )

    # --- loop -----------------------------------------------------------------
    log_every = int(cfg.get("log_every", 10))
    ckpt_every = int(cfg.get("ckpt_every", 50_000))
    max_steps = cfg.get("max_steps")  # optional early stop for smoke runs
    train_steps = start_step
    running = []
    # Optional per-step loss trace (tests/test_overfit.py, loss-curve studies):
    # losses stay on device until the end so tracing never syncs the loop.
    history = [] if bool(cfg.get("return_loss_history", False)) else None
    t0 = time.time()
    profiler = StepProfiler(
        cfg.get("profile_dir"),
        start_step=int(cfg.get("profile_start_step", 10)),
        num_steps=int(cfg.get("profile_steps", 5)),
        enabled=(rank == 0),
    )
    throughput = Throughput(global_batch)
    if resume_fast_forward:
        rng = jax.jit(
            lambda k: jax.lax.scan(
                lambda c, _: (jax.random.split(c, 3)[0], None), k, None,
                length=resume_fast_forward,
            )[0]
        )(rng)
    logger.info(f"Training for {cfg.epochs} epochs...")

    for epoch in range(int(cfg.epochs)):
        logger.info(f"Beginning epoch {epoch}...")
        loader = make_loader(
            dataset, host_batch, shuffle=True,
            seed=int(cfg.get("global_seed", 0)), epoch=epoch,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        for x_ct, _mask, z_mri in loader:
            rng, enc_rng, step_rng = jax.random.split(rng, 3)
            if cond is not None:
                x3 = np.concatenate([x_ct] * 3, axis=1)
                z3 = np.concatenate([z_mri] * 3, axis=1)
                batch = cond(enc_rng, x3, z3)
            elif fixed_batch is not None:
                batch = fixed_batch
            else:
                batch = synthetic_batch(
                    enc_rng, host_batch, latent, tokens,
                    dim=model.hidden_size,
                )
            batch = shard_batch(jax.tree.map(np.asarray, batch), mesh)
            state, metrics = train_step(state, batch, step_rng)
            # keep the loss on device: a float() here would sync the host to
            # the step and defeat async dispatch; per-step wandb points are
            # flushed (step-tagged) at each log_every boundary instead.
            running.append(metrics["loss"])
            if history is not None:
                history.append(metrics)
            train_steps += 1
            profiler.step(train_steps)
            throughput.tick()

            if train_steps % log_every == 0:
                losses = np.asarray(jax.device_get(running), np.float32)
                if cfg.get("wandb"):
                    first = train_steps - len(losses) + 1
                    for j, v in enumerate(losses):
                        wandb.log({"loss": float(v)}, step=first + j)
                tp = throughput.report()
                logger.info(
                    f"(step={train_steps:07d}) Train Loss: "
                    f"{np.nanmean(losses):.4f}, Train Steps/Sec: "
                    f"{tp['steps_per_sec']:.2f}, Images/Sec/Chip: "
                    f"{tp['images_per_sec_per_chip']:.2f}"
                )
                running, t0 = [], time.time()

            if train_steps % ckpt_every == 0 and train_steps > 0:
                # Orbax saves are COLLECTIVE in a multi-process runtime (the
                # checkpointer runs its own cross-host coordination), so
                # every process calls save; only rank 0's experiment dir is
                # real, the others follow its path layout.  The explicit
                # barrier afterwards is the dist.barrier() parity point
                # (train.py:303).
                path = save_checkpoint(
                    os.path.join(exp_dir, "checkpoints"), train_steps,
                    {
                        "model": jax.device_get(state.params),
                        "ema": jax.device_get(state.ema_params),
                        "opt": jax.device_get(state.opt_state),
                        "args": cfg.to_dict(),
                    },
                )
                if rank == 0:
                    logger.info(f"Saved checkpoint to {path}")
                if jax.process_count() > 1:
                    # dist.barrier() parity (train.py:303)
                    from jax.experimental import multihost_utils

                    multihost_utils.sync_global_devices("ckpt")
            if max_steps is not None and train_steps >= int(max_steps):
                profiler.close()
                logger.info("Done!")
                wandb.finish()
                return _finish(state, history)
    profiler.close()
    logger.info("Done!")
    wandb.finish()
    return _finish(state, history)


def _finish(state, history):
    """With ``return_loss_history: true`` main returns ``(state, metrics)``
    where metrics is a dict of per-step fp32 arrays (loss + aux loss terms);
    otherwise just the final state."""
    if history is None:
        return state
    keys = history[0].keys()
    stacked = {
        k: np.asarray(jax.device_get([m[k] for m in history]), np.float32)
        for k in keys
    }
    return state, stacked


def build_conditioning(cfg, logger, rng):
    return Conditioning(cfg, logger, rng)


def cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--wandb", action="store_true", default=None)
    parser.add_argument("--autocast", action="store_true", default=None)
    parser.add_argument("--use-mamba2", dest="use_mamba2", action="store_true",
                        default=None)
    parser.add_argument("--config", type=str, required=True)
    main(parse_cli(parser))


if __name__ == "__main__":
    cli()
