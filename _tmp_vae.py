import time, jax, jax.numpy as jnp, numpy as np
from diffma_tpu.models.vae import AutoencoderKL, SD_VAE_SCALE

vae = AutoencoderKL(dtype=jnp.bfloat16)
vv = vae.init(jax.random.PRNGKey(2), jax.random.PRNGKey(3), jnp.zeros((1, 3, 224, 224)))
lat = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 28, 28))
dec = jax.jit(lambda v, z: vae.apply(v, z / SD_VAE_SCALE, method=AutoencoderKL.decode))
np.asarray(dec(vv, lat))
t0 = time.time()
for _ in range(10):
    o = dec(vv, lat)
np.asarray(o)
print(f"decode batch8: {(time.time()-t0)/10*1000:.1f} ms")
