import time, numpy as np, jax, jax.numpy as jnp
from bundletrack_tpu.solver import DenseFrames
from bundletrack_tpu.solver.dense_p2p import dense_p2p_normal_equations
from bundletrack_tpu.geometry.camera import scale_intrinsics
KBA=16
rngn=np.random.RandomState(0)
pi,pj=np.triu_indices(KBA,k=1); pi=jnp.asarray(pi,jnp.int32); pj=jnp.asarray(pj,jnp.int32)
Hd,Wd=120,160
dense=DenseFrames(points=jnp.asarray(rngn.rand(KBA,Hd,Wd,3).astype(np.float32)),
                  normals=jnp.zeros((KBA,Hd,Wd,3)).at[...,2].set(-1.),
                  valid=jnp.ones((KBA,Hd,Wd),bool))
K=jnp.asarray(np.array([[600.,0,320],[0,600,240],[0,0,1]],np.float32))
Klow=scale_intrinsics(K,0.25)
fv=jnp.ones(KBA,bool)
poses=jnp.broadcast_to(jnp.eye(4),(KBA,4,4))
fd=jax.jit(lambda poses: dense_p2p_normal_equations(poses,dense,fv,pi,pj,Klow))
t0=time.time()
o=jax.block_until_ready(fd(poses))
print("compile+run", time.time()-t0, flush=True)
t0=time.perf_counter()
for _ in range(10): o=jax.block_until_ready(fd(poses))
print(f"dense term 1 linearization: {(time.perf_counter()-t0)/10*1000:.2f} ms", flush=True)
