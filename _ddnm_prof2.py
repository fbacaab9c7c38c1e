import time
import jax
import jax.numpy as jnp
from pointdreamer_tpu.models.diffusion import imagenet256_unet, init_unet_params

model = imagenet256_unet()
t0 = time.time()
params = init_unet_params(model, image_size=64)
print('params ready', time.time() - t0, flush=True)
fwd = jax.jit(lambda p, x, t: model.apply({'params': p}, x, t))
xs = [jax.random.normal(jax.random.PRNGKey(i), (8, 256, 256, 3))
      for i in range(3)]
t = jnp.zeros((8,))
t0 = time.time()
out = fwd(params, xs[0], t)
jax.block_until_ready(out)
print('compile+first fwd', time.time() - t0, float(jnp.abs(out).mean()),
      flush=True)
for trial in range(3):
    t0 = time.time()
    o1 = fwd(params, xs[1], t)
    o2 = fwd(params, xs[2], t)
    s = float(jnp.abs(o1).mean() + jnp.abs(o2).mean())
    dt = (time.time() - t0) / 2
    print('per fwd:', dt, 's   sum', s, flush=True)
