import time, jax, jax.numpy as jnp, numpy as np, optax
from pointdreamer_tpu.pipeline.optimize import _bilinear_tables, _transpose_to_atlas
R=1024; res=256; V=8
rng=np.random.default_rng(0)
uv=jnp.asarray(rng.random((V,res,res,2)).astype(np.float32))
tgt=jnp.asarray(rng.random((V*res*res,3)).astype(np.float32))
mask=jnp.ones((V*res*res,1))
idx,w,order,starts,ends = jax.jit(_bilinear_tables, static_argnames='R')(uv, R=R)
jax.block_until_ready(idx)
ats=[jnp.asarray(rng.random((R,R,3)).astype(np.float32)) for _ in range(6)]

def timeit(f,name,args_list):
    o=f(*args_list[0]); jax.block_until_ready(o)
    # force real execution with host read of tiny slice
    t0=time.time()
    outs=[f(*a) for a in args_list[1:]]
    for o in outs:
        x=jax.tree_util.tree_leaves(o)[0]
        float(jnp.asarray(x).ravel()[0])
    print(name,(time.time()-t0)/len(args_list[1:])*1000,'ms',flush=True)

f1=jax.jit(lambda a:(a.reshape(-1,3)[idx]*w[...,None]).sum(1))
timeit(f1,'fwd gather',[ (a,) for a in ats])
f2=jax.jit(lambda a: ((jnp.clip((a.reshape(-1,3)[idx]*w[...,None]).sum(1),0,1)-tgt)))
timeit(f2,'fwd+diff',[ (a,) for a in ats])
gpixs=[jnp.asarray(rng.standard_normal((V*res*res,3)).astype(np.float32)) for _ in range(6)]
f3=jax.jit(lambda g: _transpose_to_atlas(g,w,order,starts,ends))
timeit(f3,'transpose',[ (g,) for g in gpixs])
