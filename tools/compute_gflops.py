"""Offline FLOP counter for DiffMa denoiser configs.

The reference authors measured model cost with a gitignored
``compute_gflot.py`` script built on fvcore (/root/reference/.gitignore:23,
environment.yml:54); nothing was committed.  This tool is the committed
equivalent: it reports

* the analytic forward FLOPs (``diffma_tpu.utils.profiling.model_flops`` —
  mixer matmuls + scan elementwise work, the number the training logs and
  bench.py MFU fields use), and
* with ``--xla``, the XLA-counted FLOPs of the actual jitted forward
  (``jit(...).lower().compile().cost_analysis()``), which includes every op
  the compiler emits (adaLN, patchify, skips, ...).

Usage:
    python tools/compute_gflops.py                       # DiffMa-B/2 @ 224
    python tools/compute_gflops.py --model DiffMa-XXL/2 --image-size 224
    python tools/compute_gflops.py --xla --use-mamba2 --batch 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="DiffMa-B/2")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--use-mamba2", action="store_true")
    ap.add_argument("--sample-steps", type=int, default=250,
                    help="chain length for the per-image sampling cost")
    ap.add_argument("--xla", action="store_true",
                    help="also count FLOPs from the compiled HLO")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from diffma_tpu.models.diffma import build_model
    from diffma_tpu.train.train import synthetic_batch
    from diffma_tpu.utils.profiling import model_flops

    latent = args.image_size // 8
    model = build_model(
        args.model, input_size=latent, d_state=16,
        use_mamba2=args.use_mamba2, dtype=jnp.bfloat16,
    )
    tokens = (latent // model.patch_size) ** 2
    analytic = model_flops(
        depth=model.depth, hidden=model.hidden_size, tokens=tokens,
        d_state=model.d_state,
    )
    report = {
        "model": args.model,
        "image_size": args.image_size,
        "tokens": tokens,
        "depth": model.depth,
        "hidden": model.hidden_size,
        "use_mamba2": bool(args.use_mamba2),
        "analytic_fwd_gflops_per_image": round(analytic / 1e9, 3),
        "analytic_sample_tflops_per_image": round(
            args.sample_steps * analytic / 1e12, 3
        ),
        "sample_steps": args.sample_steps,
    }

    if args.xla:
        cond = synthetic_batch(jax.random.PRNGKey(0), args.batch, latent, tokens)
        params = model.init(
            jax.random.PRNGKey(1), cond["z"],
            jnp.zeros((args.batch,), jnp.int32),
            cond["y"], cond["y2"], cond["w"],
        )["params"]

        def fwd(p, z, t, y, y2, w):
            return model.apply({"params": p}, z, t, y, y2, w)

        compiled = (
            jax.jit(fwd)
            .lower(params, cond["z"], jnp.zeros((args.batch,), jnp.int32),
                   cond["y"], cond["y2"], cond["w"])
            .compile()
        )
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        if cost and "flops" in cost:
            report["xla_fwd_gflops_per_image"] = round(
                float(cost["flops"]) / args.batch / 1e9, 3
            )
            report["xla_bytes_accessed_mb_per_image"] = round(
                float(cost.get("bytes accessed", 0.0)) / args.batch / 1e6, 3
            )
        else:  # backend returned no analysis (some runtimes)
            report["xla_fwd_gflops_per_image"] = None

    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
