"""CT-encoder contrastive pretraining (TPU re-design of train_embedder.py).

Usage: ``python -m diffma_tpu.train.train_embedder --config configs/brain.yaml``

Trains ``CTEncoder`` on VAE latents of CT slices with the batch-wise InfoNCE
objective of the reference (train_embedder.py:29-36): flatten tokens,
L2-normalise, similarity / tau=0.07, cross-entropy against the identity
pairing.  EMA decay 0.9999 (train_embedder.py:39); AdamW(1e-4, wd=0).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffma_tpu.data import NpyDataset, SyntheticTriplets, make_loader, transform_train
from diffma_tpu.models.ct_encoder import CTEncoder
from diffma_tpu.models.vae import AutoencoderKL
from diffma_tpu.train.checkpoints import save_checkpoint
from diffma_tpu.train.state import TrainState, make_train_step
from diffma_tpu.utils.config import parse_cli
from diffma_tpu.utils.logging import create_experiment_dir, create_logger

__all__ = ["main", "info_nce_loss_b"]


def info_nce_loss_b(x: jax.Array, tau: float = 0.07) -> jax.Array:
    """Batch-wise InfoNCE (train_embedder.py:29-36)."""
    B = x.shape[0]
    flat = x.reshape(B, -1).astype(jnp.float32)
    flat = flat / (jnp.linalg.norm(flat, axis=1, keepdims=True) + 1e-12)
    sim = flat @ flat.T / tau
    labels = jnp.arange(B)
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def main(cfg):
    rank = jax.process_index()
    if rank == 0:
        exp_dir = create_experiment_dir(str(cfg.embedder_results_dir), "vision_encoder")
        logger = create_logger(exp_dir, rank)
        logger.info(f"Experiment directory created at {exp_dir}")
    else:
        exp_dir, logger = None, create_logger(None, rank)

    rng = jax.random.PRNGKey(int(cfg.get("embedder_global_seed", 0)))
    latent = cfg.image_size // 8
    model = CTEncoder(
        img_size=latent,
        patch_size=int(cfg.get("embedder_patch_size", 2)),
        in_channels=4,
        embed_dim=int(cfg.get("embedder_embed_dim", 512)),
        contain_mask_token=True,
    )

    vae = AutoencoderKL()
    vae_ckpt = cfg.get("vae_ckpt")
    if vae_ckpt and os.path.exists(str(vae_ckpt)):
        vae_vars = np.load(vae_ckpt, allow_pickle=True).item()
    else:
        logger.info("sd-vae weights unavailable; random frozen VAE")
        vae_vars = vae.init(
            jax.random.PRNGKey(0), jax.random.PRNGKey(1),
            jnp.zeros((1, 3, cfg.image_size, cfg.image_size)),
        )

    rng, init_rng = jax.random.split(rng)
    params = model.init(init_rng, jnp.zeros((2, 4, latent, latent)))["params"]
    logger.info(f"Parameters: {sum(p.size for p in jax.tree.leaves(params)):,}")

    opt = optax.adamw(1e-4, weight_decay=0.0)
    state = TrainState.create(params, opt)

    def loss_fn(params, batch, rng):
        del rng
        _, x = model.apply({"params": params}, batch["lat"])
        return info_nce_loss_b(x), {}

    step_fn = jax.jit(make_train_step(loss_fn, opt, ema_decay=0.9999))

    @jax.jit
    def encode(rng, x_ct):
        return vae.apply(vae_vars, rng, x_ct, method=AutoencoderKL.encode_sample)

    folders = (
        cfg.get("ct_image_folder_train"),
        cfg.get("mask_image_folder_train"),
        cfg.get("mir_image_folder_train"),
    )
    if not cfg.get("synthetic_data") and all(
        f and os.path.isdir(str(f)) for f in folders
    ):
        dataset = NpyDataset(*map(str, folders), transform=transform_train)
    else:
        logger.info("dataset folders unavailable; synthetic data")
        dataset = SyntheticTriplets(
            n=int(cfg.get("synthetic_dataset_size", 64)), size=cfg.image_size
        )

    gbs = int(cfg.get("embedder_global_batch_size", 32))
    host_batch = gbs // jax.process_count()
    train_steps, running, t0 = 0, [], time.time()
    max_steps = cfg.get("max_steps")
    log_every = int(cfg.get("log_every", 10))
    ckpt_every = int(cfg.get("embedder_ckpt_every", 5000))

    logger.info(f"Training for {cfg.embedder_epoch} epochs...")
    for epoch in range(int(cfg.embedder_epoch)):
        logger.info(f"Beginning epoch {epoch}...")
        loader = make_loader(
            dataset, host_batch, shuffle=True, epoch=epoch,
            seed=int(cfg.get("embedder_global_seed", 0)),
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        for x_ct, _, _ in loader:
            rng, enc_rng, step_rng = jax.random.split(rng, 3)
            x3 = jnp.asarray(np.concatenate([x_ct] * 3, axis=1))
            lat = encode(enc_rng, x3)
            state, metrics = step_fn(state, {"lat": lat}, step_rng)
            running.append(metrics["loss"])
            train_steps += 1
            if train_steps % log_every == 0:
                losses = np.asarray(jax.device_get(running), np.float32)
                sps = len(running) / (time.time() - t0)
                logger.info(
                    f"(step={train_steps:07d}) Train Loss: "
                    f"{np.nanmean(losses):.8f}, Train Steps/Sec: {sps:.2f}"
                )
                running, t0 = [], time.time()
            if train_steps % ckpt_every == 0 and train_steps > 0 and rank == 0:
                path = save_checkpoint(
                    os.path.join(exp_dir, "checkpoints"), train_steps,
                    {
                        "model": jax.device_get(state.params),
                        "ema": jax.device_get(state.ema_params),
                        "opt": jax.device_get(state.opt_state),
                        "args": cfg.to_dict(),
                    },
                )
                logger.info(f"Saved checkpoint to {path}")
            if max_steps is not None and train_steps >= int(max_steps):
                return state
    return state


def cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--wandb", action="store_true", default=None)
    parser.add_argument("--autocast", action="store_true", default=None)
    main(parse_cli(parser))


if __name__ == "__main__":
    cli()
