"""Why does Mamba2 DDPM-250 sampling measure LOWER at bs64 than bs32?

BASELINE.md round-4 capacity table: 11.5 img/s @ bs32 vs 9.84 @ bs64
(DDPM-250, full pipeline) — a 14% per-image regression at the larger
batch.  This probe isolates the three candidate regions at both batch
sizes, chained-jit + np.asarray fetch (tunnel-safe), per-image ms:

  1. the 8-block fused dual-mixer forward stack at the step's exact
     stream shapes (the Pallas-kernel share);
  2. one full denoiser forward (model.apply, everything incl. permute
     tables, adaLN, patchify);
  3. the SD-VAE decode.

If (1) scales super-linearly bs32->bs64 the dip is kernel grid/VMEM
scheduling; if only (3), it's the VAE; if none, it's the p_sample_loop
glue.  Results recorded in BASELINE.md.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/probes/probe_bs_dip.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffma_tpu.models.diffma import build_model
from diffma_tpu.models.mamba2 import Mamba2
from diffma_tpu.models.vae import SD_VAE_SCALE, AutoencoderKL
from diffma_tpu.ops.fused_ssd import mamba2_dual_mixer_fused
from diffma_tpu.ops.scan_orders import build_scan_spec
from diffma_tpu.train.train import synthetic_batch

LATENT, TOKENS, DEPTH = 28, 196, 8


def _fetch(x):
    return np.asarray(jax.tree.leaves(x)[0])


def _time(fn, *args, reps=5, warm=6):
    out = None
    for _ in range(warm):
        out = fn(*args)
    _fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return (time.time() - t0) / reps


def main():
    model = build_model(
        "DiffMa-B/2", input_size=LATENT, d_state=16, dtype=jnp.bfloat16,
        use_mamba2=True, scan_impl="fused",
    )
    vae = AutoencoderKL(dtype=jnp.bfloat16)
    vae_vars = vae.init(
        jax.random.PRNGKey(2), jax.random.PRNGKey(3), jnp.zeros((1, 3, 224, 224))
    )

    mixer = Mamba2(d_model=512, d_state=16, dtype=jnp.bfloat16)
    spec0 = build_scan_spec("spiral", LATENT // 2, 0)
    specs = [build_scan_spec("spiral", LATENT // 2, i) for i in range(DEPTH)]

    rows = {}
    for batch in (32, 64):
        cond = synthetic_batch(jax.random.PRNGKey(0), batch, LATENT, TOKENS)
        params = model.init(
            jax.random.PRNGKey(1), cond["z"], jnp.zeros((batch,), jnp.int32),
            cond["y"], cond["y2"], cond["w"],
        )["params"]

        # 1. fused dual-mixer stack alone (scalar-reduced: see
        #    probe_train_breakdown.py on tunnel fetch cost)
        x0 = jax.random.normal(
            jax.random.PRNGKey(5), (2, batch, TOKENS, 512), jnp.bfloat16
        )
        mp = mixer.init(jax.random.PRNGKey(6), x0[0], spec0)["params"]
        weights = tuple(
            jnp.stack([v, v])
            for v in (
                mp["in_proj"]["kernel"], mp["conv1d_weight"], mp["conv1d_bias"],
                mp["dt_bias"], mp["A_log"], mp["D"], mp["norm_weight"],
                mp["out_proj"]["kernel"],
            )
        )

        @jax.jit
        def mixers_fwd(x, weights):
            for i in range(DEPTH):
                x = mamba2_dual_mixer_fused(specs[i], x, *weights)
            return jnp.sum(x.astype(jnp.float32))

        t_mix = _time(mixers_fwd, x0, weights)

        # 2. full denoiser forward, 4 chained calls inside one jit
        @jax.jit
        def denoiser_chain(params, z):
            def body(x, i):
                t = jnp.full((batch,), 10 * i, jnp.int32)
                out = model.apply(
                    {"params": params}, x, t,
                    cond["y"], cond["y2"], cond["w"],
                ).astype(jnp.float32)
                return out[:, :4] * 1e-3 + z, None

            x, _ = jax.lax.scan(body, z, jnp.arange(4))
            return jnp.sum(x)

        z = jax.random.normal(jax.random.PRNGKey(4), (batch, 4, LATENT, LATENT))
        t_den = _time(denoiser_chain, params, z) / 4

        # 3. VAE decode
        @jax.jit
        def decode(lat):
            return jnp.sum(
                vae.apply(
                    vae_vars, lat / SD_VAE_SCALE, method=AutoencoderKL.decode
                ).astype(jnp.float32)
            )

        t_vae = _time(decode, z.astype(jnp.bfloat16))

        rows[f"bs{batch}"] = {
            "mixers_fwd_ms": round(1000 * t_mix, 3),
            "mixers_fwd_ms_per_img": round(1000 * t_mix / batch, 4),
            "denoiser_fwd_ms": round(1000 * t_den, 3),
            "denoiser_fwd_ms_per_img": round(1000 * t_den / batch, 4),
            "vae_decode_ms": round(1000 * t_vae, 3),
            "vae_decode_ms_per_img": round(1000 * t_vae / batch, 4),
        }
        print(json.dumps({f"bs{batch}": rows[f"bs{batch}"]}), flush=True)

    r32, r64 = rows["bs32"], rows["bs64"]
    print(json.dumps({
        "per_img_ratio_bs64_over_bs32": {
            k.replace("_ms_per_img", ""): round(r64[k] / r32[k], 3)
            for k in r32 if k.endswith("per_img")
        }
    }, indent=2))


if __name__ == "__main__":
    main()
