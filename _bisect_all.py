import sys, time, functools, numpy as np, jax, jax.numpy as jnp
from bundletrack_tpu.geometry.se3 import se3_inverse, rotate_points
from bundletrack_tpu.geometry.robust import huber
from bundletrack_tpu.solver.residuals import scatter_blocks
_mm=functools.partial(jnp.matmul,precision="highest")
_einsum=functools.partial(jnp.einsum,precision="highest")
Kf,Hh,Ww=16,120,160; N=Hh*Ww
rng=np.random.RandomState(0)
pts=jnp.asarray(rng.rand(Kf,N,3).astype(np.float32))
nrm=jnp.zeros((Kf,N,3)).at[...,2].set(-1.)
val=jnp.ones((Kf,N),bool)
pi,pj=np.triu_indices(Kf,k=1)
src=jnp.asarray(np.concatenate([pi,pj]),jnp.int32); tgt=jnp.asarray(np.concatenate([pj,pi]),jnp.int32)
poses=jnp.broadcast_to(jnp.eye(4),(Kf,4,4))
fx,fy,cx,cy=150.,150.,79.5,59.5
def stage(level):
    def f(poses):
        T_src=poses[src]; T_tgt=poses[tgt]
        T_rel=_mm(se3_inverse(T_tgt),T_src)
        p_src=pts[src]; n_src=nrm[src]; ok_src=val[src]
        R_rel=T_rel[:,:3,:3]; t_rel=T_rel[:,:3,3]
        p_in_t=rotate_points(R_rel,p_src)+t_rel[:,None,:]
        z=p_in_t[...,2]; sz=jnp.where(z>1e-6,z,1.)
        u=p_in_t[...,0]/sz*fx+cx; v=p_in_t[...,1]/sz*fy+cy
        ui=jnp.round(u).astype(jnp.int32); vi=jnp.round(v).astype(jnp.int32)
        inb=(ui>=0)&(ui<Ww)&(vi>=0)&(vi<Hh)&(z>1e-6)
        lin=jnp.clip(vi,0,Hh-1)*Ww+jnp.clip(ui,0,Ww-1)
        if level==0: return jnp.sum(lin)+jnp.sum(inb)
        p_tgt=jnp.take_along_axis(pts[tgt],lin[...,None],axis=1)
        n_tgt=jnp.take_along_axis(nrm[tgt],lin[...,None],axis=1)
        v_tgt=jnp.take_along_axis(val[tgt],lin,axis=1)
        if level==1: return jnp.sum(p_tgt)+jnp.sum(n_tgt)+jnp.sum(v_tgt)
        d2=jnp.sum((p_tgt-p_in_t)**2,axis=-1)
        n_src_t=rotate_points(R_rel,n_src)
        cos_sn=jnp.sum(n_src_t*n_tgt,axis=-1)
        ok=inb&v_tgt&ok_src&(d2<4e-4)&(cos_sn>0.7)
        if level==2: return jnp.sum(ok)
        Rs,ts=T_src[:,:3,:3],T_src[:,:3,3]; Rt,tt=T_tgt[:,:3,:3],T_tgt[:,:3,3]
        q_src=rotate_points(Rs,p_src)+ts[:,None,:]
        q_tgt=rotate_points(Rt,p_tgt)+tt[:,None,:]
        n_model=rotate_points(Rt,n_tgt)
        r=jnp.sum((q_tgt-q_src)*n_model,axis=-1)
        if level==3: return jnp.sum(r)
        _,rho1=huber(r*r,0.005)
        n_corr=jnp.sum(ok,axis=-1)
        pw=jnp.where(n_corr>=800, 1.0/jnp.minimum(jnp.log(jnp.maximum(n_corr.astype(r.dtype),2.)),9.),0.)
        w=rho1*ok.astype(r.dtype)*pw[:,None]
        n=n_model
        Ji=jnp.concatenate([-n,-jnp.cross(q_src,n)],axis=-1)
        dq=q_tgt-q_src
        Jj=jnp.concatenate([n,jnp.cross(q_tgt,n)+jnp.cross(n,dq)],axis=-1)
        if level==4: return jnp.sum(Ji)+jnp.sum(Jj)+jnp.sum(w)
        Hss=_einsum("dna,dn,dnb->dab",Ji,w,Ji)
        Htt=_einsum("dna,dn,dnb->dab",Jj,w,Jj)
        Hst=_einsum("dna,dn,dnb->dab",Ji,w,Jj)
        gs=_einsum("dna,dn,dn->da",Ji,w,r)
        gt=_einsum("dna,dn,dn->da",Jj,w,r)
        if level==5: return jnp.sum(Hss)+jnp.sum(Htt)+jnp.sum(Hst)+jnp.sum(gs)+jnp.sum(gt)
        H,g=scatter_blocks(Kf,src,tgt,Hss,Htt,Hst,gs,gt)
        return jnp.sum(H)+jnp.sum(g)
    return jax.jit(f)
for lvl in range(7):
    t0=time.time()
    f=stage(lvl)
    o=jax.block_until_ready(f(poses))
    print(f"level {lvl}: compile+run {time.time()-t0:.1f}s", flush=True)
    t0=time.perf_counter()
    for _ in range(5): o=jax.block_until_ready(f(poses))
    print(f"level {lvl}: {(time.perf_counter()-t0)/5*1000:.2f} ms", flush=True)
