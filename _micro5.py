import time, jax, jax.numpy as jnp, numpy as np
from pointdreamer_tpu.pipeline.optimize import _bilinear_tables, _transpose_to_atlas
R=1024; res=256; V=8
rng=np.random.default_rng(0)
uv=jnp.asarray(rng.random((V,res,res,2)).astype(np.float32))
idx,w,order,starts,ends = jax.jit(_bilinear_tables, static_argnames='R')(uv, R=R)
P=V*res*res

def chain(f, x0, n=20, name=''):
    x=f(x0); x=f(x)  # compile+warm
    t0=time.time()
    x=x0
    for _ in range(n): x=f(x)
    float(jnp.asarray(x).ravel()[0])
    print(name,(time.time()-t0)/n*1000,'ms',flush=True)

g0=jnp.asarray(rng.standard_normal((P,3)).astype(np.float32))
# transpose chained: g -> atlas_grad [R*R,3] -> back to pixel space via fwd gather
f_t=jax.jit(lambda g: (_transpose_to_atlas(g,w,order,starts,ends)[idx]*w[...,None]).sum(1))
chain(f_t, g0, name='transpose+fwd roundtrip')
f_f=jax.jit(lambda g: _transpose_to_atlas((g.reshape(-1,3)[idx]*w[...,None]).sum(1)*1e-3, w,order,starts,ends))
chain(f_f, jnp.asarray(rng.standard_normal((R*R,3)).astype(np.float32)), name='fwd+transpose roundtrip')
# permute only chain
f_p=jax.jit(lambda g: jnp.concatenate([g[order][:P],g[order][P:2*P]],0)[:P]*1.0000001)
chain(f_p, g0, name='permute-ish chain')
# cumsum only
f_c=jax.jit(lambda g: jnp.cumsum(g,axis=0)*1e-6)
chain(f_c, jnp.asarray(rng.standard_normal((4*P,3)).astype(np.float32)), name='cumsum chain 2M')
