import time, jax, jax.numpy as jnp, numpy as np, optax, functools
from pointdreamer_tpu.pipeline.optimize import _bilinear_tables, _transpose_to_atlas
R=1024; res=256; V=8
rng=np.random.default_rng(0)
uv=jnp.asarray(rng.random((V,res,res,2)).astype(np.float32))
tgt=jnp.asarray(rng.random((V*res*res,3)).astype(np.float32))
mask=jnp.ones((V*res*res,1))
idx,w,order,starts,ends = jax.jit(_bilinear_tables, static_argnames='R')(uv, R=R)
jax.block_until_ready(idx)
opt=optax.adam(5e-2)

@jax.jit
def step(atlas, opt_state):
    flat=atlas.reshape(-1,3)
    rendered=(flat[idx]*w[...,None]).sum(1)
    diff=jnp.clip(rendered,0,1)-tgt
    g_pix=(jnp.sign(diff)*mask*((rendered>0)&(rendered<1)))/ (tgt.shape[0]*3)
    g=_transpose_to_atlas(g_pix,w,order,starts,ends)
    u,opt_state=opt.update(g.reshape(atlas.shape),opt_state)
    return optax.apply_updates(atlas,u),opt_state

atlases=[jnp.asarray(rng.random((R,R,3)).astype(np.float32)) for _ in range(4)]
st=opt.init(atlases[0])
a2,st2=step(atlases[0],st); jax.block_until_ready(a2)
t0=time.time()
x=atlases[1]; s=st
for i in range(20): x,s=step(x,s)
print('sum',float(np.asarray(x).sum()))
print('per step ms:',(time.time()-t0)/20*1000, flush=True)
