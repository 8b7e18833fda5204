"""Headline benchmark: DiffMa-B/2 224^2 sampling throughput on one chip.

Prints ONE JSON line:
    {"metric": "images/sec/chip", "value": N, "unit": "img/s",
     "vs_baseline": R, ...aux fields...}

Protocol (matches BASELINE.json: "images/sec/chip (DiffMa-B/2, 224^2,
250-step DDPM); train steps/sec"):
  * DiffMa-B/2, 28x28x4 latents (224^2 images), learned-range sigma,
    250-step respaced DDPM chain via one jitted lax.scan, followed by the
    SD-VAE decode -- the full sample.py device pipeline.
  * value = batch / wall-time per sampling call, single chip.
  * vs_baseline divides by an estimated A100 reference throughput for the
    upstream implementation (A100_BASELINE_IMG_S below).  The reference
    publishes no numbers (README.md, .gitignore:23-31); its sampler runs 250
    sequential host-loop iterations of ~100 small CUDA kernel launches at
    batch 1 (sample.py:109, config brain.yaml sample_global_batch_size: 1),
    which bounds it to a few images/sec; 2.0 img/s is a deliberately
    generous estimate.  BASELINE.json's target is >=5x that.

Aux fields: Mamba2/SSD sampling headline (--use-mamba2 protocol), a
DDIM-50 fast protocol (the reference's inherited diffusion library supports
"ddimN" respacing + ddim_sample_loop, but its shipped sampling script always
uses DDPM p_sample_loop with numeric respacing, sample.py:53,109 — so DDIM-50
is an additional fast protocol this repo exercises, not the reference's
standard one),
train steps/sec (B/2, global batch 8), analytic model-FLOP utilisation (`mfu`)
against the device's peak (the denoiser's matmul+scan FLOPs only; VAE decode
and gathers excluded, so it is a *lower bound* on achieved FLOP/s).

Timing hygiene: results are fetched with np.asarray per timed region --
under the axon TPU tunnel, block_until_ready() does not reliably wait for
completion (device-side queue), while a literal fetch does.
"""

import json
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_IMG_S = 2.0  # estimated upstream A100 sampling throughput


def _arm_device_watchdog(seconds: float = 300.0):
    """Emit a JSON error line and exit if the first device op never returns.

    The containerised TPU is reached through a tunnel; when the tunnel is
    down, jax.devices() / the first transfer blocks forever rather than
    raising.  A hung bench records nothing -- an explicit error line is
    strictly more useful.  Disarmed once the first device round-trip
    completes (compile times after that are bounded)."""
    done = threading.Event()

    def _watch():
        if not done.wait(seconds):
            print(
                json.dumps(
                    {
                        "metric": "images/sec/chip (DiffMa-B/2, 224^2, 250-step DDPM)",
                        "value": 0.0,
                        "unit": "img/s",
                        "vs_baseline": 0.0,
                        "error": f"device unreachable: first device op did not "
                                 f"complete within {seconds:.0f}s (TPU tunnel down?)",
                    }
                ),
                flush=True,
            )
            os._exit(2)

    threading.Thread(target=_watch, daemon=True).start()
    return done
BATCH = 8
STEPS = 250

# Peak dense bf16 matmul FLOP/s per chip (for the analytic-MFU aux field).
_PEAK_FLOPS = {
    "v5 lite": 197e12,  # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6": 918e12,  # trillium
}


def _device_peak_flops() -> float:
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for key, peak in _PEAK_FLOPS.items():
        if key in kind:
            return peak
    return 0.0


def _fetch(tree):
    """Force completion + host fetch (see timing-hygiene note above)."""
    return np.asarray(jax.tree.leaves(tree)[0])


WINDOWS = 5  # timed windows per metric; headline = median (VERDICT r4 #7)


def _window_stats(times):
    """Per-call times for >=5 windows -> (median, spread dict).

    The tunnelled device shows run-to-run variance that has straddled the
    5x threshold; a single window can sink or flatter the capture, so each
    metric reports the median across windows plus min/max.
    """
    arr = np.asarray(times)
    med = float(np.median(arr))
    return med, {
        "min": round(float(arr.min()), 4),
        "max": round(float(arr.max()), 4),
        "spread_pct": round(100.0 * float(arr.max() - arr.min()) / med, 1),
    }


def _time_sampler(model, params, vae, vae_vars, diffusion, cond, use_ddim=False,
                  reps=2):
    """Median per-call sampling time over WINDOWS timed windows (+ spread)."""
    from diffma_tpu.models.vae import SD_VAE_SCALE, AutoencoderKL

    loop = diffusion.ddim_sample_loop if use_ddim else diffusion.p_sample_loop

    @jax.jit
    def sample(params, rng, z, y, y2, w):
        def model_fn(x, t, **kw):
            return model.apply({"params": params}, x, t, **kw).astype(jnp.float32)

        lat = loop(
            model_fn, z.shape, rng, noise=z, clip_denoised=False,
            model_kwargs={"y": y, "y2": y2, "w": w},
        )
        return vae.apply(vae_vars, lat / SD_VAE_SCALE, method=AutoencoderKL.decode)

    latent = cond["z"].shape[-1]
    z = jax.random.normal(jax.random.PRNGKey(4), (BATCH, 4, latent, latent))
    args = (params, jax.random.PRNGKey(5), z, cond["y"], cond["y2"], cond["w"])
    _fetch(sample(*args))  # compile + warm
    times = []
    for _ in range(WINDOWS):
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = sample(*args)
        _fetch(out)
        times.append((time.time() - t0) / reps)
    return _window_stats(times)


def main():
    import optax

    watchdog = _arm_device_watchdog()
    _fetch(jnp.zeros((8, 8)) + 1.0)  # first device round-trip
    watchdog.set()

    from diffma_tpu.diffusion import create_diffusion
    from diffma_tpu.models.diffma import build_model
    from diffma_tpu.models.vae import AutoencoderKL
    from diffma_tpu.train.state import TrainState, make_train_step
    from diffma_tpu.train.train import make_loss_fn, synthetic_batch
    from diffma_tpu.utils.profiling import model_flops

    latent, tokens = 28, 196
    # Inference uses the fully fused mixer kernel (conv+projections+scan+gate
    # in one Pallas call); training keeps the composable path below.
    sampler_impl = "fused" if jax.default_backend() == "tpu" else "auto"
    model = build_model(
        "DiffMa-B/2", input_size=latent, d_state=16, dtype=jnp.bfloat16,
        scan_impl=sampler_impl,
    )
    rng = jax.random.PRNGKey(0)
    cond = synthetic_batch(rng, BATCH, latent, tokens)
    params = model.init(
        jax.random.PRNGKey(1), cond["z"], jnp.zeros((BATCH,), jnp.int32),
        cond["y"], cond["y2"], cond["w"],
    )["params"]

    vae = AutoencoderKL(dtype=jnp.bfloat16)
    vae_vars = vae.init(
        jax.random.PRNGKey(2), jax.random.PRNGKey(3), jnp.zeros((1, 3, 224, 224))
    )

    diffusion = create_diffusion(str(STEPS))
    sample_time, sample_spread = _time_sampler(
        model, params, vae, vae_vars, diffusion, cond
    )
    img_s = BATCH / sample_time

    # Analytic MFU of the sampling run: STEPS denoiser calls x batch, against
    # peak bf16 matmul FLOP/s (0.0 when the device kind is unknown).
    flops_fwd = model_flops(depth=8, hidden=512, tokens=tokens)
    peak = _device_peak_flops()
    sample_mfu = (
        round(STEPS * BATCH * flops_fwd / sample_time / peak, 4) if peak else None
    )

    # --- Mamba2/SSD headline (aux): same protocol, --use-mamba2 backbone ----
    model2 = build_model(
        "DiffMa-B/2", input_size=latent, d_state=16, dtype=jnp.bfloat16,
        use_mamba2=True, scan_impl=sampler_impl,
    )
    params2 = model2.init(
        jax.random.PRNGKey(1), cond["z"], jnp.zeros((BATCH,), jnp.int32),
        cond["y"], cond["y2"], cond["w"],
    )["params"]
    sample_time2, sample2_spread = _time_sampler(
        model2, params2, vae, vae_vars, diffusion, cond
    )
    img_s_mamba2 = BATCH / sample_time2

    # DDIM-50 fast path (aux): the reference's diffusion library supports
    # "ddimN" respacing + ddim_sample_loop (respace.py:12-62,
    # gaussian_diffusion.py:656-680) but its shipped sample.py always calls
    # DDPM p_sample_loop with numeric respacing (sample.py:53,109) — this is
    # an additional fast protocol this repo exercises, with no reference
    # baseline number.  Same model/weights, ddim_sample_loop.
    ddim_diffusion = create_diffusion("ddim50")
    sample_time_ddim, _ = _time_sampler(
        model2, params2, vae, vae_vars, ddim_diffusion, cond, use_ddim=True, reps=3
    )
    img_s_ddim50 = BATCH / sample_time_ddim

    # Mamba2 train steps/sec (aux): fused fwd + hand-derived Pallas bwd.
    train_diff2 = create_diffusion("")
    opt2 = optax.adamw(1e-4, weight_decay=0.0)
    state2 = TrainState.create(params2, opt2)
    step2 = jax.jit(
        make_train_step(make_loss_fn(model2, train_diff2), opt2),
        donate_argnums=(0,),
    )
    # Warm-up: compile + a full timed-length window.  The first ~10 steps
    # after compile run up to ~40% slow (allocator/donation settling under
    # the axon tunnel); a single warm-up step is not enough.
    for i in range(11):
        state2, m2 = step2(state2, cond, jax.random.fold_in(jax.random.PRNGKey(8), i))
    _fetch(m2["loss"])
    t_windows2 = []
    for wdx in range(WINDOWS):
        t0 = time.time()
        for i in range(10):
            state2, m2 = step2(
                state2, cond, jax.random.fold_in(jax.random.PRNGKey(9), 10 * wdx + i)
            )
        _fetch(m2["loss"])
        t_windows2.append((time.time() - t0) / 10.0)
    train2_time, train2_spread = _window_stats(t_windows2)
    steps_s_mamba2 = 1.0 / train2_time

    # --- train steps/sec (aux): fused wins training too (decomposed
    # Pallas-adjoint VJP), so the protocol uses it on TPU -------------------
    model = build_model(
        "DiffMa-B/2", input_size=latent, d_state=16, dtype=jnp.bfloat16,
        scan_impl=sampler_impl,
    )
    params = model.init(
        jax.random.PRNGKey(1), cond["z"], jnp.zeros((BATCH,), jnp.int32),
        cond["y"], cond["y2"], cond["w"],
    )["params"]
    train_diff = create_diffusion("")
    optimizer = optax.adamw(1e-4, weight_decay=0.0)
    state = TrainState.create(params, optimizer)
    step = jax.jit(
        make_train_step(make_loss_fn(model, train_diff), optimizer),
        donate_argnums=(0,),
    )
    # Warm-up: compile + a full timed-length window (see mamba2 note above).
    for i in range(11):
        state, m = step(state, cond, jax.random.fold_in(jax.random.PRNGKey(6), i))
    _fetch(m["loss"])
    t_windows = []
    for wdx in range(WINDOWS):
        t0 = time.time()
        for i in range(10):
            state, m = step(
                state, cond, jax.random.fold_in(jax.random.PRNGKey(7), 10 * wdx + i)
            )
        _fetch(m["loss"])
        t_windows.append((time.time() - t0) / 10.0)
    train_time, train_spread = _window_stats(t_windows)
    steps_s = 1.0 / train_time
    # fwd + bwd ~= 3x fwd FLOPs
    train_mfu = (
        round(3 * BATCH * flops_fwd / train_time / peak, 4) if peak else None
    )

    print(
        json.dumps(
            {
                "metric": "images/sec/chip (DiffMa-B/2, 224^2, 250-step DDPM)",
                "value": round(img_s, 3),
                "unit": "img/s",
                "vs_baseline": round(img_s / A100_BASELINE_IMG_S, 2),
                "mamba2_images_per_sec": round(img_s_mamba2, 3),
                "mamba2_vs_baseline": round(img_s_mamba2 / A100_BASELINE_IMG_S, 2),
                "mamba2_ddim50_images_per_sec": round(img_s_ddim50, 3),
                "train_steps_per_sec_bs8": round(steps_s, 3),
                "mamba2_train_steps_per_sec_bs8": round(steps_s_mamba2, 3),
                # Per-metric spread across the timed windows (median is the
                # reported value; min/max are per-call seconds).
                "timing_windows": WINDOWS,
                "sample_time_spread": sample_spread,
                "mamba2_sample_time_spread": sample2_spread,
                "train_time_spread": train_spread,
                "mamba2_train_time_spread": train2_spread,
                "sample_mfu": sample_mfu,
                "train_mfu": train_mfu,
                "model_flops_fwd": flops_fwd,
                "sample_batch": BATCH,
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
