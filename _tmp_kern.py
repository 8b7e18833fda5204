import time, jax, jax.numpy as jnp, numpy as np
from diffma_tpu.ops.fused_ssd import mamba2_dual_mixer_fused
from diffma_tpu.ops.scan_orders import build_scan_spec

B, L, h = 8, 196, 512
d, n, H, K = 1024, 16, 16, 4
dproj, conv_dim = 2*d + 2*n + H, d + 2*n
spec = build_scan_spec("spiral", 14, 0)
ks = jax.random.split(jax.random.PRNGKey(0), 9)
cd = jnp.bfloat16
x12 = jax.random.normal(ks[0], (2, B, L, h), cd)
W = lambda i, s, sc=0.05: jax.random.normal(ks[i], (2,) + s) * sc
ws = (W(1, (h, dproj)), W(2, (conv_dim, K), 0.3), W(3, (conv_dim,), 0.1),
      W(4, (H,), 0.2), jax.random.uniform(ks[5], (2, H), minval=0.0, maxval=1.5),
      W(6, (H,), 0.5) + 1.0, W(7, (d,), 0.1) + 1.0, W(8, (d, h)))

N_IT = 64
@jax.jit
def many(x, *w):
    def body(c, _):
        o = mamba2_dual_mixer_fused(spec, c, *w, (0.0, float("inf")), 1e-5, 256)
        return o.astype(c.dtype), None
    out, _ = jax.lax.scan(body, x, None, length=N_IT)
    return out
np.asarray(many(x12, *ws))
t0 = time.time(); REP = 5
for _ in range(REP):
    o = many(x12, *ws)
np.asarray(o)
dt = (time.time()-t0)/REP/N_IT*1000
print(f"dual SSD kernel in-jit: {dt:.3f} ms -> x8 blocks = {dt*8:.2f} ms")
