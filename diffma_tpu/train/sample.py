"""DiffMa sampling pipeline (TPU-native re-design of sample.py).

Usage: ``python -m diffma_tpu.train.sample --config configs/brain.yaml``

The reference runs 250 sequential ``p_sample`` host iterations, each a
device round-trip (gaussian_diffusion.py:498-511, sample.py:109); here the
whole respaced DDPM chain is a single jitted ``lax.scan``, so a batch of
images is one device program.  Checkpoint loading honours ``load_ckpt_type``
("ema" | "model", sample.py:19-27); the Mamba1-only quirk of the reference
(sample.py:42-46 never passes use_mamba2) is surfaced as an explicit config
key instead.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from diffma_tpu.data import NpyDataset, SyntheticTriplets, make_loader, transform_test
from diffma_tpu.diffusion import create_diffusion
from diffma_tpu.models.diffma import build_model
from diffma_tpu.models.vae import SD_VAE_SCALE, AutoencoderKL
from diffma_tpu.parallel import make_mesh, shard_batch
from diffma_tpu.train.checkpoints import load_diffma_params
from diffma_tpu.train.train import Conditioning, synthetic_batch
from diffma_tpu.utils.config import parse_cli
from diffma_tpu.utils.logging import create_logger
from diffma_tpu.utils.metrics import quality_report

__all__ = ["main", "save_image_grid"]


def save_image_grid(
    images: np.ndarray, path: str, nrow: int = 4, value_range=(-1, 1)
) -> None:
    """PNG grid writer (torchvision.utils.save_image parity: normalize into
    value_range, tile with nrow images per row, 2px padding)."""
    from PIL import Image

    lo, hi = value_range
    imgs = np.clip((np.asarray(images, np.float32) - lo) / (hi - lo), 0, 1)
    if imgs.shape[1] == 1:
        imgs = np.repeat(imgs, 3, axis=1)
    imgs = (imgs[:, :3].transpose(0, 2, 3, 1) * 255).astype(np.uint8)
    n, h, w, _ = imgs.shape
    ncol = int(np.ceil(n / nrow))
    pad = 2
    canvas = np.zeros((ncol * (h + pad) + pad, nrow * (w + pad) + pad, 3), np.uint8)
    for i, img in enumerate(imgs):
        r, c = divmod(i, nrow)
        y, x = pad + r * (h + pad), pad + c * (w + pad)
        canvas[y : y + h, x : x + w] = img
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(canvas).save(path)


def main(cfg):
    logger = create_logger(None, jax.process_index())
    rng = jax.random.PRNGKey(int(cfg.get("seed", 0)))

    latent = cfg.image_size // 8
    model = build_model(
        str(cfg.model),
        input_size=latent,
        dt_rank=int(cfg.get("dt_rank", 16)),
        d_state=int(cfg.get("d_state", 16)),
        use_mamba2=bool(cfg.get("use_mamba2", False)),
        # whole-block fused Pallas mixer kernels on TPU
        scan_impl=str(
            cfg.get(
                "scan_impl",
                "fused" if jax.default_backend() == "tpu" else "auto",
            )
        ),
        dtype=jnp.bfloat16 if cfg.get("autocast") else jnp.float32,
    )
    diffusion = create_diffusion(str(cfg.get("sample_num_steps", 250)))

    # --- weights -------------------------------------------------------------
    tokens = (latent // model.patch_size) ** 2
    dummy = synthetic_batch(jax.random.PRNGKey(0), 1, latent, tokens)
    init_params = model.init(
        jax.random.PRNGKey(1), dummy["z"], jnp.zeros((1,), jnp.int32),
        dummy["y"], dummy["y2"], dummy["w"],
    )["params"]
    ckpt_path = cfg.get("ckpt")
    if ckpt_path and os.path.exists(str(ckpt_path)):
        loaded = load_diffma_params(
            str(ckpt_path), model, str(cfg.get("load_ckpt_type", "ema"))
        )
        params = jax.tree.map(lambda t, l: jnp.asarray(l, t.dtype), init_params, loaded)
        logger.info(f"Loaded {cfg.get('load_ckpt_type', 'ema')} weights from {ckpt_path}")
    else:
        params = init_params
        logger.info("No checkpoint found; sampling from random weights")

    synthetic = bool(cfg.get("synthetic_data", False))
    folders = (
        cfg.get("ct_image_folder_val"),
        cfg.get("mask_image_folder_val"),
        cfg.get("mir_image_folder_val"),
    )
    cond = None
    if not synthetic and all(f and os.path.isdir(str(f)) for f in folders):
        rng, cond_rng = jax.random.split(rng)
        cond = Conditioning(cfg, logger, cond_rng)
        dataset = NpyDataset(*map(str, folders), transform=transform_test)
    else:
        dataset = SyntheticTriplets(
            n=int(cfg.get("synthetic_dataset_size", 8)), size=cfg.image_size
        )
        if cond is None and not synthetic:
            logger.info("val folders unavailable; using synthetic conditioning")

    vae = AutoencoderKL()
    vae_vars = cond.vae_vars if cond is not None else vae.init(
        jax.random.PRNGKey(2), jax.random.PRNGKey(3),
        jnp.zeros((1, 3, cfg.image_size, cfg.image_size)),
    )

    use_ddim = bool(cfg.get("use_ddim", False))

    @jax.jit
    def sample_batch(params, rng, z_init, y, y2, w):
        def model_fn(x, t, **kw):
            return model.apply({"params": params}, x, t, **kw).astype(jnp.float32)

        loop = diffusion.ddim_sample_loop if use_ddim else diffusion.p_sample_loop
        samples = loop(
            model_fn, z_init.shape, rng, noise=z_init, clip_denoised=False,
            model_kwargs={"y": y, "y2": y2, "w": w},
        )
        return vae.apply(
            vae_vars, samples / SD_VAE_SCALE, method=AutoencoderKL.decode
        )

    batch_size = int(cfg.get("sample_global_batch_size", 1))
    save_dir = str(cfg.get("save_dir", "./result_sample"))
    n_batches = int(cfg.get("sample_num_batches", 0)) or None

    # Shard the sample batch over the dp mesh axis when it divides evenly;
    # XLA parallelises the whole scan+decode program across chips.  Gated
    # per batch: with drop_last=False the final batch can be a partial one
    # (n % dp != 0) that cannot be dp-sharded and must run replicated.
    mesh = make_mesh(tp=1)
    use_mesh = mesh.shape["dp"] > 1

    def place(tree, n):
        if use_mesh and n % mesh.shape["dp"] == 0:
            return shard_batch(tree, mesh)
        return tree

    loader = make_loader(
        dataset, batch_size, shuffle=False, drop_last=False,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    results = []
    quality = []
    for item, (x_ct, _mask, z_mri) in enumerate(loader, start=1):
        n = x_ct.shape[0]
        rng, z_rng, enc_rng, s_rng = jax.random.split(rng, 4)
        z = jax.random.normal(z_rng, (n, 4, latent, latent))
        if cond is not None:
            x3 = np.concatenate([x_ct] * 3, axis=1)
            z3 = np.concatenate([z_mri] * 3, axis=1)
            b = cond(enc_rng, x3, z3)
            y, y2, w = b["y"], b["y2"], b["w"]
        else:
            b = synthetic_batch(enc_rng, n, latent, tokens)
            y, y2, w = b["y"], b["y2"], b["w"]
        z, y, y2, w = place((z, y, y2, w), n)
        samples = sample_batch(params, s_rng, z, y, y2, w)
        samples = np.asarray(samples)
        results.append(samples)
        save_image_grid(samples, f"{save_dir}/{item}_sample_gen.png")
        save_image_grid(
            np.concatenate([z_mri] * 3, axis=1), f"{save_dir}/{item}_sample_ori.png"
        )
        save_image_grid(
            np.concatenate([x_ct] * 3, axis=1), f"{save_dir}/{item}_sample_ct.png"
        )
        # Quality vs ground-truth MRI (the reference authors did this with
        # offline gitignored ssim.py/psnr.py scripts; here it is built in).
        q = quality_report(samples, np.concatenate([z_mri] * 3, axis=1))
        quality.append(q)
        logger.info(
            f"saved sample grid {item}  "
            f"PSNR {q['psnr_db']:.2f} dB  SSIM {q['ssim']:.4f}"
        )
        if n_batches and item >= n_batches:
            break
    if quality:
        logger.info(
            "quality over %d batches: PSNR %.2f dB, SSIM %.4f"
            % (
                len(quality),
                float(np.mean([q["psnr_db"] for q in quality])),
                float(np.mean([q["ssim"] for q in quality])),
            )
        )
    return results


def cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint path (reference sample.py --ckpt)")
    parser.add_argument("--use-mamba2", dest="use_mamba2", action="store_true",
                        default=None)
    main(parse_cli(parser))


if __name__ == "__main__":
    cli()
