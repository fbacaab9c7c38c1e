import time, numpy as np, jax, jax.numpy as jnp
from pointdreamer_tpu.ops.image import bilinear_sample
import optax

R=1024; res=256; V=8
key=jax.random.PRNGKey(0)
atlas=jax.random.uniform(key,(R,R,3))
uv=jax.random.uniform(key,(V,res,res,2))
tgt=jax.random.uniform(key,(V,res,res,3))
mask=jnp.ones((V,res,res))

def loss_fn(a):
    r=bilinear_sample(a,uv)
    return (jnp.abs(jnp.clip(r,0,1)-tgt)*mask[...,None]).mean()

opt=optax.adam(5e-2)
@jax.jit
def step(a,s):
    l,g=jax.value_and_grad(loss_fn)(a)
    u,s=opt.update(g,s)
    return optax.apply_updates(a,u),s,l

s=opt.init(atlas)
a,s,l=step(atlas,s); jax.block_until_ready(a)  # compile
t0=time.time()
for _ in range(10): a,s,l=step(a,s)
jax.block_until_ready(a)
print('per-iter ms:', (time.time()-t0)/10*1000, flush=True)

# forward only
fwd=jax.jit(loss_fn)
l=fwd(a); jax.block_until_ready(l)
t0=time.time()
for _ in range(10): l=fwd(a)
jax.block_until_ready(l)
print('fwd-only ms:', (time.time()-t0)/10*1000, flush=True)
