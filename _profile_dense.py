import glob, time, numpy as np, jax, jax.numpy as jnp
from bundletrack_tpu.solver import DenseFrames
from bundletrack_tpu.solver.dense_p2p import dense_p2p_normal_equations
from bundletrack_tpu.geometry.camera import scale_intrinsics
KBA=16
rngn=np.random.RandomState(0)
pi,pj=np.triu_indices(KBA,k=1); pi=jnp.asarray(pi,jnp.int32); pj=jnp.asarray(pj,jnp.int32)
Hd,Wd=120,160
pts=jnp.asarray(rngn.rand(KBA,Hd,Wd,3).astype(np.float32))
nrm=jnp.zeros((KBA,Hd,Wd,3)).at[...,2].set(-1.)
val=jnp.ones((KBA,Hd,Wd),bool)
K=jnp.asarray(np.array([[600.,0,320],[0,600,240],[0,0,1]],np.float32))
Klow=scale_intrinsics(K,0.25)
fv=jnp.ones(KBA,bool)
poses=jnp.broadcast_to(jnp.eye(4),(KBA,4,4)).copy()
def f(poses, pts, nrm, val, Klow):
    return dense_p2p_normal_equations(poses, DenseFrames(points=pts,normals=nrm,valid=val), fv, pi, pj, Klow)
fj=jax.jit(f)
o=jax.block_until_ready(fj(poses,pts,nrm,val,Klow))
t0=time.perf_counter()
for _ in range(5): o=jax.block_until_ready(fj(poses,pts,nrm,val,Klow))
print("dense (args): %.1f ms"%((time.perf_counter()-t0)/5*1000), flush=True)
jax.profiler.start_trace("/tmp/densetrace")
for _ in range(3): o=jax.block_until_ready(fj(poses,pts,nrm,val,Klow))
jax.profiler.stop_trace()
print("trace files:", glob.glob("/tmp/densetrace/**/*.xplane.pb", recursive=True), flush=True)
