"""Micro-breakdown inside the dense point-to-plane term.

Times (a) transform+project to association indices, (b) the stacked-channel
gather, (c) the 90 JtJ/Jtr reductions, at bench scale D=240 directed pairs,
N=19200 px.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bundletrack_tpu.utils.timing import hard_sync
import time

import numpy as np




def timed(name, fn, *args, reps=10):
    import jax

    out = hard_sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    hard_sync(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    Kf, Hd, Wd = 16, 120, 160
    N = Hd * Wd
    P = 120
    D = 2 * P
    rngn = np.random.RandomState(0)
    pi_np, pj_np = np.triu_indices(Kf, k=1)
    src = jnp.asarray(np.concatenate([pi_np, pj_np]), jnp.int32)
    tgt = jnp.asarray(np.concatenate([pj_np, pi_np]), jnp.int32)

    chan = jnp.asarray(rngn.rand(Kf, N, 8).astype(np.float32))
    lin = jnp.asarray(rngn.randint(0, N, size=(D, N)).astype(np.int32))
    planes = jnp.asarray(rngn.rand(13, D, N).astype(np.float32))

    print(f"device: {jax.devices()[0].platform}")

    # (a) gather via [tgt] then take_along_axis (current formulation)
    def gather_a(chan, lin):
        return jnp.take_along_axis(chan[tgt], lin[..., None], axis=1)

    timed("gather: chan[tgt] + take_along_axis", jax.jit(gather_a), chan, lin)

    # (b) gather via flat fused index into [K*N, 8]
    def gather_b(chan, lin):
        flat = chan.reshape(Kf * N, 8)
        idx = tgt[:, None] * N + lin  # [D, N]
        return jnp.take(flat, idx, axis=0)  # [D, N, 8]

    timed("gather: flat take from [K*N, 8]", jax.jit(gather_b), chan, lin)

    # (b2) same but bf16 channels
    chan16 = chan.astype(jnp.bfloat16)

    def gather_b16(chan, lin):
        flat = chan.reshape(Kf * N, 8)
        idx = tgt[:, None] * N + lin
        return jnp.take(flat, idx, axis=0)

    timed("gather: flat take bf16", jax.jit(gather_b16), chan16, lin)

    # (c) 90 reductions (blocks+grad) on resident planes
    def reductions(planes):
        w = planes[0]
        J = [planes[1 + a] for a in range(12)]
        outs = []
        for a in range(6):
            for b in range(6):
                outs.append(jnp.sum(w * J[a] * J[b], axis=-1))
            outs.append(jnp.sum(w * J[a] * planes[0], axis=-1))
        for a in range(6):
            for b in range(6):
                outs.append(jnp.sum(w * J[6 + a] * J[6 + b], axis=-1))
            for b in range(6):
                outs.append(jnp.sum(w * J[a] * J[6 + b], axis=-1))
        return jnp.stack(outs, -1)

    timed("JtJ/Jtr reductions (114 sums)", jax.jit(reductions), planes)

    # (d) MXU alternative: [D, 13, N] @ [D, N, 13] batched matmul
    def mxu(planes):
        Jm = jnp.transpose(planes, (1, 0, 2))  # [D, 13, N]
        return jax.lax.dot_general(
            Jm, Jm,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [D, 13, 13]

    timed("JtJ via batched MXU matmul f32", jax.jit(mxu), planes)

    planes16 = planes.astype(jnp.bfloat16)
    timed("JtJ via batched MXU matmul bf16", jax.jit(mxu), planes16)

    # (e) elementwise chain representative of transform+project
    def chain(planes):
        x, y, z = planes[0], planes[1], planes[2]
        ax = 0.9 * x + 0.1 * y + 0.05 * z + 0.01
        ay = 0.1 * x + 0.9 * y + 0.05 * z + 0.02
        az = 0.05 * x + 0.05 * y + 0.9 * z + 0.03
        u = ax / jnp.where(az > 1e-6, az, 1.0) * 600.0 + 320.0
        v = ay / jnp.where(az > 1e-6, az, 1.0) * 600.0 + 240.0
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        return jnp.clip(vi, 0, Hd - 1) * Wd + jnp.clip(ui, 0, Wd - 1)

    timed("transform+project chain", jax.jit(chain), planes)


if __name__ == "__main__":
    main()
