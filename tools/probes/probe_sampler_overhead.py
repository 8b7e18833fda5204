"""A/B the p_sample_loop scan body: per-step coefficient gathers + fold_in
RNG (current) vs pre-hoisted coefficient tables + pre-generated noise
(candidate).  Outputs must match EXACTLY (same RNG stream, same math).

Run on TPU for timing; on CPU only the equality check matters.
"""
import time
import jax, jax.numpy as jnp, numpy as np
from diffma_tpu.models.diffma import DiffMa
from diffma_tpu.diffusion import create_diffusion
from diffma_tpu.train.train import synthetic_batch

TPU = jax.default_backend() == "tpu"
BATCH, latent, tokens, N = (8, 28, 196, 250) if TPU else (2, 8, 16, 8)

cond = synthetic_batch(jax.random.PRNGKey(0), BATCH, latent, tokens)
model = DiffMa(input_size=latent, patch_size=2, depth=8 if TPU else 2,
               hidden_size=512, block_type="spiral", d_state=16,
               use_mamba2=True, dtype=jnp.bfloat16 if TPU else jnp.float32,
               scan_impl="fused" if TPU else "auto")
params = model.init(jax.random.PRNGKey(1), cond["z"],
                    jnp.zeros((BATCH,), jnp.int32), cond["y"], cond["y2"],
                    cond["w"])["params"]
diffusion = create_diffusion(str(N))
z = jax.random.normal(jax.random.PRNGKey(4), (BATCH, 4, latent, latent))


def model_fn_factory(params):
    def model_fn(x, t, **kw):
        return model.apply({"params": params}, x, t, **kw).astype(jnp.float32)
    return model_fn


@jax.jit
def sample_current(params, rng, z):
    return diffusion.p_sample_loop(
        model_fn_factory(params), z.shape, rng, noise=z, clip_denoised=False,
        model_kwargs={"y": cond["y"], "y2": cond["y2"], "w": cond["w"]})


# ---- candidate: hoisted tables + pre-generated noise -----------------------
d = diffusion
T = d.num_timesteps
ts = jnp.arange(T - 1, -1, -1)  # timestep per scan step i: T-1-i
tables = jnp.stack([
    jnp.take(d.posterior_log_variance_clipped, ts),
    jnp.take(d.log_betas, ts),
    jnp.take(d.sqrt_recip_alphas_cumprod, ts),
    jnp.take(d.sqrt_recipm1_alphas_cumprod, ts),
    jnp.take(d.posterior_mean_coef1, ts),
    jnp.take(d.posterior_mean_coef2, ts),
], axis=1)  # (T, 6)
tmap = jnp.take(d.timestep_map, ts) if d.timestep_map is not None else ts
nonzero_tbl = (ts != 0).astype(jnp.float32)


@jax.jit
def sample_hoisted(params, rng, z):
    rng, _init = jax.random.split(rng)
    mf = model_fn_factory(params)
    # pre-generate the whole noise stack with the SAME per-step streams
    noise_all = jax.vmap(
        lambda i: jax.random.normal(jax.random.fold_in(rng, i), z.shape,
                                    z.dtype)
    )(jnp.arange(T))

    def step(img, xs):
        row, tm, nz, noise = xs
        t_model = jnp.full((z.shape[0],), tm, jnp.int32)
        out = mf(img, t_model, y=cond["y"], y2=cond["y2"], w=cond["w"])
        eps, var_raw = jnp.split(out, 2, axis=1)
        min_log, max_log = row[0], row[1]
        frac = (var_raw + 1) / 2
        log_var = frac * max_log + (1 - frac) * min_log
        x0 = row[2] * img - row[3] * eps
        mean = row[4] * x0 + row[5] * img
        img = mean + nz * jnp.exp(0.5 * log_var) * noise
        return img, None

    img, _ = jax.lax.scan(step, z, (tables, tmap, nonzero_tbl, noise_all))
    return img


def timeit(fn, *args, reps=3):
    out = fn(*args); np.asarray(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / reps


r = jax.random.PRNGKey(5)
a = np.asarray(sample_current(params, r, z))
b = np.asarray(sample_hoisted(params, r, z))
print("max |current - hoisted|:", np.abs(a - b).max())

if TPU:
    t_cur = timeit(sample_current, params, r, z)
    t_hoi = timeit(sample_hoisted, params, r, z)
    print(f"current:  {t_cur*1e3:.1f} ms ({t_cur/N*1e3:.4f} ms/step)")
    print(f"hoisted:  {t_hoi*1e3:.1f} ms ({t_hoi/N*1e3:.4f} ms/step)")
