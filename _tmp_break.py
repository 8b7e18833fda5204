import time, jax, jax.numpy as jnp, numpy as np
from diffma_tpu.models.diffma import build_model
from diffma_tpu.train.train import synthetic_batch

BATCH, latent, tokens = 8, 28, 196
cond = synthetic_batch(jax.random.PRNGKey(0), BATCH, latent, tokens)
model = build_model("DiffMa-B/2", input_size=latent, d_state=16,
                    dtype=jnp.bfloat16, use_mamba2=True, scan_impl="fused")
params = model.init(jax.random.PRNGKey(1), cond["z"],
                    jnp.zeros((BATCH,), jnp.int32), cond["y"], cond["y2"], cond["w"])["params"]
t = jnp.full((BATCH,), 100, jnp.int32)

fwd = jax.jit(lambda p, z: model.apply({"params": p}, z, t, cond["y"], cond["y2"], cond["w"]))
z = cond["z"]
np.asarray(fwd(params, z))
t0 = time.time(); REP = 100
for _ in range(REP):
    o = fwd(params, z)
np.asarray(o)
print(f"bare fwd: {(time.time()-t0)/REP*1000:.3f} ms")

# loop overhead estimate: 250 chained forwards without diffusion math
@jax.jit
def chain(p, z):
    def body(c, _):
        o = model.apply({"params": p}, c, t, cond["y"], cond["y2"], cond["w"])
        return o[:, :4], None
    out, _ = jax.lax.scan(body, z, None, length=50)
    return out
np.asarray(chain(params, z))
t0 = time.time()
for _ in range(3):
    o = chain(params, z)
np.asarray(o)
print(f"chained fwd: {(time.time()-t0)/3/50*1000:.3f} ms/step")
