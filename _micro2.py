import time, jax, jax.numpy as jnp, numpy as np
from pointdreamer_tpu.pipeline import optimize as popt
R=1024; res=256; V=8
rng=np.random.default_rng(0)
atlas0=jnp.asarray(rng.random((R,R,3)).astype(np.float32))
uv=jnp.asarray(rng.random((V,res,res,2)).astype(np.float32))
tgt=jnp.asarray(rng.random((V,res,res,3)).astype(np.float32))
mask=jnp.ones((V,res,res))
def run(iters):
    a,l = popt._optimize_loop(atlas0, tgt, uv, mask, 5e-2, iters, R)
    return np.asarray(a).sum()  # force real transfer
run(10)  # compile 10
run(100) # compile 100
t0=time.time(); run(10); d10=time.time()-t0
t0=time.time(); run(100); d100=time.time()-t0
print('10 iters:', d10, '100 iters:', d100, 'per-iter ms:', (d100-d10)/90*1000, flush=True)
