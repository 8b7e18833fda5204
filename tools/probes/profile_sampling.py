"""Breakdown of the --use-mamba2 sampling headline: where does each ms go?

Measures (axon timing hygiene: chained in one jit, np.asarray fetch):
  1. denoiser fwd alone, chained 250x          (fuse_block False/True)
  2. full p_sample_loop (250 steps, no VAE)    -> per-step delta vs (1)
  3. VAE decode alone
  4. full sample() as bench.py times it
"""
import time
import jax, jax.numpy as jnp, numpy as np
from diffma_tpu.models.diffma import DiffMa
from diffma_tpu.models.vae import SD_VAE_SCALE, AutoencoderKL
from diffma_tpu.diffusion import create_diffusion
from diffma_tpu.train.train import synthetic_batch

BATCH, latent, tokens, N = 8, 28, 196, 250
rng = jax.random.PRNGKey(0)
cond = synthetic_batch(rng, BATCH, latent, tokens)
z = jax.random.normal(jax.random.PRNGKey(4), (BATCH, 4, latent, latent))


def timeit(fn, *args, reps=3):
    out = fn(*args); np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps


def build(fuse):
    model = DiffMa(input_size=latent, patch_size=2, depth=8, hidden_size=512,
                   block_type="spiral", d_state=16, use_mamba2=True,
                   dtype=jnp.bfloat16, scan_impl="fused", fuse_block=fuse)
    params = model.init(jax.random.PRNGKey(1), cond["z"],
                        jnp.zeros((BATCH,), jnp.int32), cond["y"], cond["y2"],
                        cond["w"])["params"]
    return model, params


diffusion = create_diffusion(str(N))

for fuse in (False, True):
    model, params = build(fuse)

    @jax.jit
    def chained(params, z):
        def step(x, i):
            o = model.apply({"params": params}, x,
                            jnp.full((BATCH,), 100, jnp.int32),
                            cond["y"], cond["y2"], cond["w"])
            return o[:, :4] * 1e-3 + x, None
        x, _ = jax.lax.scan(step, z, jnp.arange(N))
        return x

    t1 = timeit(chained, params, z)
    print(f"[1] denoiser chained, fuse_block={fuse}: {t1/N*1e3:.4f} ms/step "
          f"({t1*1e3:.1f} ms total)")

    @jax.jit
    def sample_novae(params, rng, z):
        def model_fn(x, t, **kw):
            return model.apply({"params": params}, x, t, **kw).astype(jnp.float32)
        return diffusion.p_sample_loop(
            model_fn, z.shape, rng, noise=z, clip_denoised=False,
            model_kwargs={"y": cond["y"], "y2": cond["y2"], "w": cond["w"]})

    t2 = timeit(sample_novae, params, jax.random.PRNGKey(5), z)
    print(f"[2] p_sample_loop no-VAE, fuse_block={fuse}: {t2/N*1e3:.4f} ms/step "
          f"({t2*1e3:.1f} ms total; sampler overhead "
          f"{(t2-t1)/N*1e3:.4f} ms/step)")

# VAE decode alone
vae = AutoencoderKL(dtype=jnp.bfloat16)
vae_vars = vae.init(jax.random.PRNGKey(2), jax.random.PRNGKey(3),
                    jnp.zeros((1, 3, 224, 224)))
lat = jax.random.normal(jax.random.PRNGKey(6), (BATCH, 4, latent, latent))

@jax.jit
def decode(v, lat):
    return vae.apply(v, lat / SD_VAE_SCALE, method=AutoencoderKL.decode)

t3 = timeit(decode, vae_vars, lat)
print(f"[3] VAE decode: {t3*1e3:.1f} ms/batch")

# full sample as bench does
model, params = build(False)

@jax.jit
def sample_full(params, rng, z):
    def model_fn(x, t, **kw):
        return model.apply({"params": params}, x, t, **kw).astype(jnp.float32)
    lat = diffusion.p_sample_loop(
        model_fn, z.shape, rng, noise=z, clip_denoised=False,
        model_kwargs={"y": cond["y"], "y2": cond["y2"], "w": cond["w"]})
    return vae.apply(vae_vars, lat / SD_VAE_SCALE, method=AutoencoderKL.decode)

t4 = timeit(sample_full, params, jax.random.PRNGKey(5), z)
print(f"[4] full sample(): {t4*1e3:.1f} ms/batch -> {BATCH/t4:.2f} img/s")
