import time
import jax, jax.numpy as jnp, numpy as np
from diffma_tpu.models.diffma import DiffMa
from diffma_tpu.train.train import synthetic_batch

BATCH, latent, tokens = 8, 28, 196
N = 250
rng = jax.random.PRNGKey(0)
cond = synthetic_batch(rng, BATCH, latent, tokens)

def timeit(fn, *args, reps=5):
    out = fn(*args); np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(reps): out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps

for fuse in (False, True):
    model = DiffMa(input_size=latent, patch_size=2, depth=8, hidden_size=512,
                   block_type="spiral", d_state=16, use_mamba2=True,
                   dtype=jnp.bfloat16, scan_impl="fused", fuse_block=fuse)
    params = model.init(jax.random.PRNGKey(1), cond["z"],
                        jnp.zeros((BATCH,), jnp.int32), cond["y"], cond["y2"],
                        cond["w"])["params"]
    @jax.jit
    def chained(params, z):
        def step(x, i):
            o = model.apply({"params": params}, x,
                            jnp.full((BATCH,), 100, jnp.int32),
                            cond["y"], cond["y2"], cond["w"])
            return o[:, :4] * 1e-3 + x, None
        x, _ = jax.lax.scan(step, z, jnp.arange(N))
        return x
    z = jax.random.normal(jax.random.PRNGKey(4), (BATCH, 4, latent, latent))
    t = timeit(chained, params, z)
    print(f"fuse_block={fuse}: {t/N*1e3:.4f} ms/step")
    # also numeric parity on TPU between the two paths
    if fuse:
        model0 = model.clone(fuse_block=False)
        a = model0.apply({"params": params}, cond["z"], jnp.zeros((BATCH,), jnp.int32), cond["y"], cond["y2"], cond["w"])
        b = model.apply({"params": params}, cond["z"], jnp.zeros((BATCH,), jnp.int32), cond["y"], cond["y2"], cond["w"])
        print("  tpu parity max err:", float(jnp.abs(a - b).max()))
