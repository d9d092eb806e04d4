import time, numpy as np, jax, jax.numpy as jnp
D,N,Kf,C=240,19200,16,8
rng=np.random.RandomState(0)
tbl=jnp.asarray(rng.rand(Kf,N,C).astype(np.float32))
tgt=jnp.asarray(rng.randint(0,Kf,D),jnp.int32)
base=jnp.asarray(rng.rand(D,N).astype(np.float32))
def bench(name,f,*a):
    o=jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(10): o=jax.block_until_ready(f(*a))
    print(f"{name}: {(time.perf_counter()-t0)/10*1000:.2f} ms",flush=True)

# computed indices + consumer math (realistic composition)
def g_plain(tbl,tgt,base):
    lin=(jnp.abs(base*12345.6).astype(jnp.int32))%N     # computed indices
    out=jnp.take_along_axis(tbl[tgt], lin[...,None], axis=1)  # [D,N,C]
    return jnp.sum(out*out,axis=(-1,))                  # consumer
def g_barrier(tbl,tgt,base):
    lin=(jnp.abs(base*12345.6).astype(jnp.int32))%N
    op=jax.lax.optimization_barrier(tbl[tgt])
    lin=jax.lax.optimization_barrier(lin)
    out=jnp.take_along_axis(op, lin[...,None], axis=1)
    out=jax.lax.optimization_barrier(out)
    return jnp.sum(out*out,axis=(-1,))
bench("stackC computed-idx plain  ", jax.jit(g_plain), tbl, tgt, base)
bench("stackC computed-idx barrier", jax.jit(g_barrier), tbl, tgt, base)
