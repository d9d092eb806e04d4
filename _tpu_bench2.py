# All device data passed as ARGUMENTS (not closed-over constants).
import time, numpy as np, jax, jax.numpy as jnp, dataclasses
from bundletrack_tpu.config import TrackerConfig, ShapeConfig
from bundletrack_tpu.solver import SparseCorres, optimize_pose_graph, GraphInputs, DenseFrames
from bundletrack_tpu.geometry.camera import scale_intrinsics

def main():
    H,W=480,640
    cfg=TrackerConfig(shapes=ShapeConfig(image_h=H,image_w=W))
    KBA=16;M=256
    rngn=np.random.RandomState(0)
    pi,pj=np.triu_indices(KBA,k=1); pi=jnp.asarray(pi,jnp.int32); pj=jnp.asarray(pj,jnp.int32)
    P=pi.shape[0]
    mpa=jnp.asarray(rngn.rand(P,M,3).astype(np.float32)); mpb=mpa+0.001
    mv=jnp.ones((P,M),bool)
    poses=jnp.broadcast_to(jnp.eye(4),(KBA,4,4)).copy()
    Hd,Wd=120,160
    dense=DenseFrames(points=jnp.asarray(rngn.rand(KBA,Hd,Wd,3).astype(np.float32)),
                      normals=jnp.zeros((KBA,Hd,Wd,3)).at[...,2].set(-1.),
                      valid=jnp.ones((KBA,Hd,Wd),bool))
    K=jnp.asarray(np.array([[600.,0,320],[0,600,240],[0,0,1]],np.float32))
    Klow=scale_intrinsics(K,0.25)
    fv=jnp.ones(KBA,bool); fm=jnp.arange(KBA)>0

    def solve(poses, mpa, mpb, mv, dense_pts, dense_nrm, dense_val, Klow):
        corres=SparseCorres(pair_i=pi,pair_j=pj,pts_i=mpa,pts_j=mpb,valid=mv)
        d=DenseFrames(points=dense_pts,normals=dense_nrm,valid=dense_val)
        inp=GraphInputs(poses=poses,frame_valid=fv,free_mask=fm,corres=corres,dense=d,K_lowres=Klow)
        return optimize_pose_graph(inp,cfg.bundle)[0]
    f=jax.jit(solve)
    t0=time.time()
    o=jax.block_until_ready(f(poses,mpa,mpb,mv,dense.points,dense.normals,dense.valid,Klow))
    print("compile+run",time.time()-t0,flush=True)
    t0=time.perf_counter()
    for _ in range(10): o=jax.block_until_ready(f(poses,mpa,mpb,mv,dense.points,dense.normals,dense.valid,Klow))
    print(f"GN sparse+dense 7it (args): {(time.perf_counter()-t0)/10*1000:.1f} ms",flush=True)

main()
