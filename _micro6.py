import time, jax, jax.numpy as jnp, numpy as np
from pointdreamer_tpu.pipeline.optimize import _bilinear_tables
R=1024; res=256; V=8
rng=np.random.default_rng(0)
uv=jnp.asarray(rng.random((V,res,res,2)).astype(np.float32))
idx,w,order,starts,ends = jax.jit(_bilinear_tables, static_argnames='R')(uv, R=R)
P=V*res*res

def transpose_cm(g):  # channel-major variant
    contrib=(g[:,None,:]*w[...,None]).reshape(-1,3)
    T=contrib[order].T                 # [3,4P]
    c=jnp.cumsum(T,axis=1)
    has=ends>=starts
    hi=c[:,jnp.maximum(ends,0)]
    lo_idx=starts-1
    lo=jnp.where((lo_idx>=0)[None,:],c[:,jnp.maximum(lo_idx,0)],0.)
    return jnp.where(has[None,:],hi-lo,0.).T

def chain(f,x0,n=20,name=''):
    x=f(x0);x=f(x)
    t0=time.time(); x=x0
    for _ in range(n): x=f(x)
    float(jnp.asarray(x).ravel()[0])
    print(name,(time.time()-t0)/n*1000,'ms',flush=True)

f=jax.jit(lambda g:(transpose_cm(g)[idx]*w[...,None]).sum(1))
g0=jnp.asarray(rng.standard_normal((P,3)).astype(np.float32))
chain(f,g0,name='cm transpose+fwd roundtrip')
