import time, jax, jax.numpy as jnp, numpy as np
def bench(f, args_list, name=''):
    o = f(*args_list[0]); jax.block_until_ready(o)
    t0=time.time()
    for a in args_list[1:]: o = f(*a)
    jax.block_until_ready(o)
    print(name, (time.time()-t0)/(len(args_list)-1)*1000, 'ms', flush=True)

R=1024; P=256*256*8
rng=np.random.default_rng(0)
n=6
atlases=[jnp.asarray(rng.random((R*R,3)).astype(np.float32)) for _ in range(n)]
idx=jnp.asarray(rng.integers(0,R*R,(P*4,)).astype(np.int32))
bigs=[jnp.asarray(rng.random((P*4,3)).astype(np.float32)) for _ in range(n)]
order=jnp.asarray(rng.permutation(P*4).astype(np.int32))
ends=jnp.asarray(np.sort(rng.integers(0,P*4,(R*R,))).astype(np.int32))

bench(jax.jit(lambda a,i: a[i]), [(a,idx) for a in atlases], name='gather 2M rows from 1M')
bench(jax.jit(lambda b: jnp.cumsum(b,axis=0)), [(b,) for b in bigs], name='cumsum 2M x3')
bench(jax.jit(lambda b,o: b[o]), [(b,order) for b in bigs], name='permute-gather 2M rows')
bench(jax.jit(lambda b,e: b[e]), [(b,ends) for b in bigs], name='gather 1M from 2M')
