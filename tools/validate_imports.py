#!/usr/bin/env python
"""Turnkey validation of real pretrained-weight imports.

The reference loads three frozen encoders plus its own DiffMa checkpoints
(train.py:156 sd-vae-ft-ema/mse, train.py:176-177 BiomedCLIP image tower,
train.py:168 CT encoder, train.py:50-60 model/ema checkpoints).  The repo's
importers are value-parity-tested against vendored torch oracles
(tests/test_vae_clip_value_parity.py, tests/test_ct_encoder.py); this script
is the production-side counterpart: point it at *actual* downloaded
checkpoints and it runs import -> structural report -> forward smoke -> and,
when the upstream torch implementation is importable, numeric forward parity.

Usage (any subset of flags):

    PYTHONPATH=/root/repo python tools/validate_imports.py \
        --vae  /path/to/sd-vae-ft-ema/diffusion_pytorch_model.bin \
        --clip /path/to/biomedclip/open_clip_pytorch_model.bin \
        --ct   /path/to/pretrain_ct_vision_embedder/brain_patch_size_2.pt \
        --diffma /path/to/results/.../checkpoints/0400000.pt \
        --diffma-model DiffMa-B/2 [--use-mamba2]

Expected tolerances (fp32, CPU vs CPU; see the parity tests):
    CT encoder : rtol 1e-4 / atol 1e-4
    VAE        : MAE < 1e-5 on decode (pure conv/GN stack)
    CLIP ViT   : MAE < 1e-4 on the 512-d projected embedding
    DiffMa     : MAE < 1e-3 over a denoiser forward (LN/exp accumulation)
On TPU, fp32 transcendental approximations add ~1e-3 absolute; run this
script with JAX_PLATFORMS=cpu for a strict check.

Oracles used when available (all optional):
    --vae   : ``diffusers.AutoencoderKL``  (the class the reference loads)
    --clip  : ``open_clip`` / ``timm`` ViT-B/16 trunk
    --ct    : the reference repo's ``block.CT_encoder`` (pure torch; pass
              --reference /root/reference to enable)
    --diffma: none in-container (needs CUDA mamba_ssm); structural + smoke.
Without an oracle the script still validates: every expected key present,
tensor/element counts on both sides, forward runs finite with the right
shapes.
"""

from __future__ import annotations

import argparse
import sys
import traceback

import numpy as np


def _section(title):
    print(f"\n=== {title} " + "=" * max(0, 60 - len(title)))


def _summarize(name, sd, tree):
    import jax

    n_src = len(sd)
    src_elems = sum(int(np.asarray(v).size) for v in sd.values())
    leaves = jax.tree.leaves(tree)
    dst_elems = sum(int(np.asarray(v).size) for v in leaves)
    print(f"  source tensors : {n_src}  ({src_elems:,} elements)")
    print(f"  imported leaves: {len(leaves)}  ({dst_elems:,} elements)")
    if src_elems != dst_elems:
        print(
            f"  NOTE element counts differ by {src_elems - dst_elems:+,} "
            "(buffers like pos_embed/num_batches_tracked are recomputed or "
            "dropped by design; a large gap means unmapped weights)"
        )
    return dst_elems


def _finite(name, arr):
    a = np.asarray(arr)
    ok = np.isfinite(a).all()
    print(
        f"  {name}: shape {a.shape}, finite={bool(ok)}, "
        f"mean {a.mean():+.4e}, std {a.std():.4e}"
    )
    if not ok:
        raise SystemExit(f"FAIL: non-finite values in {name}")


def _parity(name, got, want, tol):
    got, want = np.asarray(got), np.asarray(want)
    mae = float(np.abs(got - want).mean())
    mx = float(np.abs(got - want).max())
    verdict = "OK" if mae < tol else "FAIL"
    print(f"  parity[{name}]: MAE {mae:.3e} max {mx:.3e} (tol {tol:g}) {verdict}")
    if mae >= tol:
        raise SystemExit(f"FAIL: {name} parity exceeded tolerance")


def validate_ct(path, reference_dir):
    import jax
    import jax.numpy as jnp

    from diffma_tpu.models.ct_encoder import CTEncoder
    from diffma_tpu.utils.torch_io import (
        ct_encoder_params_from_torch,
        load_torch_checkpoint,
    )

    _section(f"CT encoder: {path}")
    ckpt = load_torch_checkpoint(path)
    sd = ckpt.get("ema", ckpt.get("model", ckpt))
    variables = ct_encoder_params_from_torch(sd)
    _summarize("ct", sd, variables)

    m = CTEncoder(
        img_size=28, patch_size=2, in_channels=4, embed_dim=512,
        contain_mask_token="mask_token" in {k.split(".")[-1] for k in sd},
    )
    x = np.random.default_rng(0).normal(size=(2, 4, 28, 28)).astype(np.float32)
    w, tok = m.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))
    _finite("weight", w)
    _finite("tokens", tok)

    if reference_dir:
        try:
            import torch

            sys.path.insert(0, reference_dir)
            from block.CT_encoder import CT_Encoder as TorchCT

            tm = TorchCT(
                img_size=28, patch_size=2, in_channels=4, embed_dim=512,
                contain_mask_token=True,
            )
            tm.load_state_dict(
                {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
            )
            tm.eval()
            with torch.no_grad():
                tw, ttok = tm(torch.from_numpy(x))
            _parity("weight", w, tw.numpy(), 1e-4)
            _parity("tokens", tok, ttok.numpy(), 1e-3)
        except ImportError as e:
            print(f"  (no torch oracle: {e})")


def validate_vae(path):
    import jax
    import jax.numpy as jnp

    from diffma_tpu.models.vae import AutoencoderKL
    from diffma_tpu.utils.torch_io import load_torch_checkpoint, vae_params_from_torch

    _section(f"SD-VAE: {path}")
    sd = load_torch_checkpoint(path)
    if not isinstance(next(iter(sd.values())), (np.ndarray, np.generic)):
        sd = sd.get("state_dict", sd)
    variables = vae_params_from_torch(sd)
    _summarize("vae", sd, variables)

    m = AutoencoderKL()
    x = np.random.default_rng(1).normal(size=(1, 3, 64, 64)).astype(np.float32)
    variables = jax.tree.map(jnp.asarray, variables)
    post = m.apply(variables, jnp.asarray(x), method=AutoencoderKL.encode)
    z = post.mode()
    _finite("latent (mode)", z)
    dec = m.apply(variables, z, method=AutoencoderKL.decode)
    _finite("decode", dec)

    try:
        import torch
        from diffusers import AutoencoderKL as DiffusersVAE

        tm = DiffusersVAE()
        tm.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()})
        tm.eval()
        with torch.no_grad():
            tz = tm.encode(torch.from_numpy(x)).latent_dist.mode()
            tdec = tm.decode(torch.from_numpy(np.asarray(z))).sample
        _parity("latent", z, tz.numpy(), 1e-4)
        _parity("decode", dec, tdec.numpy(), 1e-4)
    except ImportError as e:
        print(f"  (no diffusers oracle in this env: {e}; structural+smoke only)")


def validate_clip(path):
    import jax
    import jax.numpy as jnp

    from diffma_tpu.models.clip_vit import biomedclip_vit_b16
    from diffma_tpu.utils.torch_io import (
        clip_vision_params_from_torch,
        load_torch_checkpoint,
    )

    _section(f"BiomedCLIP image tower: {path}")
    sd = load_torch_checkpoint(path)
    sd = sd.get("state_dict", sd)
    variables = clip_vision_params_from_torch(sd)
    _summarize("clip", sd, variables)

    m = biomedclip_vit_b16()
    x = np.random.default_rng(2).normal(size=(2, 3, 224, 224)).astype(np.float32)
    emb = m.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))
    _finite("embedding", emb)
    if emb.shape[-1] != 512:
        raise SystemExit(f"FAIL: expected 512-d projection, got {emb.shape}")

    try:
        import torch
        import open_clip

        tm, _ = open_clip.create_model_from_pretrained(
            "hf-hub:microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224",
            cache_dir=None,
        )
        tm.eval()
        with torch.no_grad():
            te = tm.visual(torch.from_numpy(x))
        _parity("embedding", emb, te.numpy(), 1e-4)
    except Exception as e:  # open_clip pulls from HF hub; offline is common
        print(f"  (no open_clip oracle: {type(e).__name__}: {e}; "
              "structural+smoke only)")


def validate_diffma(path, model_name, use_mamba2, load_ckpt_type):
    import jax
    import jax.numpy as jnp

    from diffma_tpu.models.diffma import build_model
    from diffma_tpu.train.checkpoints import find_model
    from diffma_tpu.utils.torch_io import diffma_params_from_torch

    _section(f"DiffMa checkpoint: {path} as {model_name}")
    sd = find_model(path, load_ckpt_type)
    m = build_model(model_name, input_size=28, d_state=16, use_mamba2=use_mamba2)
    variables = diffma_params_from_torch(
        sd, depth=m.depth, block_type=m.block_type, use_mamba2=use_mamba2
    )
    _summarize("diffma", sd, variables)

    rng = np.random.default_rng(3)
    N, T, D = 2, 196, 512
    x = rng.normal(size=(N, 4, 28, 28)).astype(np.float32)
    args = (
        jnp.asarray(x),
        jnp.array([10, 500], jnp.int32),
        jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(N, T, D)).astype(np.float32)),
        jnp.asarray(
            1 / (1 + np.exp(-rng.normal(size=(N, T, 1)))).astype(np.float32)
        ),
    )
    out = m.apply(jax.tree.map(jnp.asarray, variables), *args)
    _finite("denoiser output", out)
    print("  (no in-container torch oracle for the full model: the reference "
          "needs CUDA mamba_ssm.  tests/test_reference_model_parity.py proves "
          "the mapping on CPU stand-ins; expected MAE there < 1e-3.)")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--vae", help="diffusers AutoencoderKL .bin/.pt state dict")
    ap.add_argument("--clip", help="BiomedCLIP/open_clip .bin/.pt state dict")
    ap.add_argument("--ct", help="CT-encoder checkpoint (.pt with model/ema)")
    ap.add_argument("--diffma", help="DiffMa training checkpoint (.pt)")
    ap.add_argument("--diffma-model", default="DiffMa-B/2")
    ap.add_argument("--use-mamba2", action="store_true")
    ap.add_argument("--load-ckpt-type", default="ema", choices=["ema", "model"])
    ap.add_argument(
        "--reference", default=None,
        help="path to the reference repo for the torch CT-encoder oracle",
    )
    args = ap.parse_args(argv)

    if not any([args.vae, args.clip, args.ct, args.diffma]):
        ap.error("nothing to validate: pass at least one of "
                 "--vae/--clip/--ct/--diffma")

    failures = []
    for flag, fn in (
        ("ct", lambda: validate_ct(args.ct, args.reference)),
        ("vae", lambda: validate_vae(args.vae)),
        ("clip", lambda: validate_clip(args.clip)),
        ("diffma", lambda: validate_diffma(
            args.diffma, args.diffma_model, args.use_mamba2,
            args.load_ckpt_type)),
    ):
        if getattr(args, flag):
            try:
                fn()
            except SystemExit as e:
                failures.append(str(e))
            except Exception:
                traceback.print_exc()
                failures.append(f"{flag}: exception during validation")

    _section("summary")
    if failures:
        for f in failures:
            print(f"  FAIL {f}")
        return 1
    print("  all requested imports validated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
