import time, numpy as np, jax, jax.numpy as jnp
D,N=240,19200
rng=np.random.RandomState(0)
a3=jnp.asarray(rng.rand(D,N,3).astype(np.float32))
a3t=jnp.asarray(rng.rand(D,3,N).astype(np.float32))
af=jnp.asarray(rng.rand(D,N*3).astype(np.float32))
def bench(name,f,*args):
    o=jax.block_until_ready(f(*args)); t0=time.perf_counter()
    for _ in range(20): o=jax.block_until_ready(f(*args))
    print(f"{name}: {(time.perf_counter()-t0)/20*1000:.2f} ms",flush=True)
f1=jax.jit(lambda x: jnp.sum(x*x+1.0,axis=-1))          # [D,N,3] -> [D,N]
f2=jax.jit(lambda x: jnp.sum(x*x+1.0,axis=1))           # [D,3,N] -> [D,N]
f3=jax.jit(lambda x: (x*x+1.0).sum(-1))                 # flat
bench("last-dim-3", f1, a3)
bench("mid-dim-3 ", f2, a3t)
bench("flat      ", f3, af)
# gather comparison: take_along_axis with computed indices
idx=jnp.asarray(rng.randint(0,N,(D,N)),jnp.int32)
g1=jax.jit(lambda t,i: jnp.take_along_axis(t,i[...,None],axis=1))   # [D,N,3]
g2=jax.jit(lambda t,i: jnp.take_along_axis(t,i[:,None,:],axis=2))   # [D,3,N]
bench("gather last3", g1, a3, idx)
bench("gather mid3 ", g2, a3t, idx)
# computed-index gather (indices derived from data)
