"""Offline SSIM/PSNR between generated and ground-truth images.

The reference authors evaluated quality with offline ``ssim.py`` / ``psnr.py``
scripts they kept out of the repo (/root/reference/.gitignore:23-31); the
committed pipeline only saves sample grids for eyeballing
(sample.py:112-115).  This tool is the committed, turnkey version of that
workflow, built on the dependency-free metrics in diffma_tpu.utils.metrics
(the same functions the sampling pipeline reports per batch).

Pairing modes:

* one directory (the sampling pipeline's ``save_dir``): pairs
  ``<item>_sample_gen.png`` with ``<item>_sample_ori.png`` — the exact
  files train/sample.py writes;
* two directories: pairs files by identical basename (``.png`` or ``.npy``).

Usage:
    python tools/compute_metrics.py result_sample/smoke
    python tools/compute_metrics.py GEN_DIR REF_DIR --data-range 255
    python tools/compute_metrics.py GEN_DIR REF_DIR --json out.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffma_tpu.utils.metrics import psnr, ssim  # noqa: E402


def _load(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.asarray(np.load(path), np.float64)
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float64)
    return np.moveaxis(img, -1, 0)  # (H, W, 3) -> (3, H, W) for the metrics


def _pairs_one_dir(d: str):
    for name in sorted(os.listdir(d)):
        if name.endswith("_sample_gen.png"):
            ref = os.path.join(d, name.replace("_sample_gen", "_sample_ori"))
            if os.path.exists(ref):
                yield name[: -len("_sample_gen.png")], os.path.join(d, name), ref


def _pairs_two_dirs(gen: str, ref: str):
    refs = set(os.listdir(ref))
    for name in sorted(os.listdir(gen)):
        if name in refs and name.endswith((".png", ".npy")):
            yield os.path.splitext(name)[0], os.path.join(gen, name), os.path.join(
                ref, name
            )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("gen_dir", help="sampling save_dir, or a directory of images")
    ap.add_argument(
        "ref_dir", nargs="?", default=None,
        help="ground-truth directory (omit to pair *_sample_gen/_ori in gen_dir)",
    )
    ap.add_argument(
        "--data-range", type=float, default=None,
        help="dynamic range (default: 255 for PNG, 2.0 for npy in [-1, 1])",
    )
    ap.add_argument("--json", default=None, help="also write the report here")
    args = ap.parse_args(argv)

    pairs = list(
        _pairs_two_dirs(args.gen_dir, args.ref_dir)
        if args.ref_dir
        else _pairs_one_dir(args.gen_dir)
    )
    if not pairs:
        print("no image pairs found", file=sys.stderr)
        return 1

    rows = []
    for item, gpath, rpath in pairs:
        a, b = _load(gpath), _load(rpath)
        if a.shape != b.shape:
            print(f"skip {item}: shape {a.shape} vs {b.shape}", file=sys.stderr)
            continue
        rng = args.data_range or (255.0 if gpath.endswith(".png") else 2.0)
        rows.append(
            {
                "item": item,
                "psnr_db": round(psnr(a, b, rng), 4),
                "ssim": round(ssim(a, b, rng), 6),
            }
        )
        print(f"{item:40s}  PSNR {rows[-1]['psnr_db']:8.3f} dB   "
              f"SSIM {rows[-1]['ssim']:.4f}")

    if not rows:
        print("no comparable pairs", file=sys.stderr)
        return 1
    report = {
        "n": len(rows),
        "psnr_db_mean": round(float(np.mean([r["psnr_db"] for r in rows])), 4),
        "ssim_mean": round(float(np.mean([r["ssim"] for r in rows])), 6),
        "items": rows,
    }
    print(
        f"\nmean over {report['n']} pairs:  PSNR {report['psnr_db_mean']:.3f} dB"
        f"   SSIM {report['ssim_mean']:.4f}"
    )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
