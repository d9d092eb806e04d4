"""Pallas fused matcher vs XLA matching path at reference scale.

Decides feature_corres.backend (VERDICT r2 item 6): compiled-mode
correctness check + timing of match_pairs_batched with backend "xla" vs
"pallas" at P=120 pairs, N=512 keypoints, D=256 descriptors (the BA
all-pairs scale, reference FeatureManager.cpp:247-368).

Usage: python benchmarks/bench_matcher.py [--pairs 120] [--n 512] [--d 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_inputs(K, N, D, seed=0):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    desc = rng.randn(K, N, D).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    pts = rng.rand(K, N, 3).astype(np.float32) * 0.2
    nrm = rng.randn(K, N, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    valid = rng.rand(K, N) < 0.9
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4)).copy()
    poses[:, :3, 3] = 0.01 * rng.randn(K, 3)
    pi, pj = np.triu_indices(K, k=1)
    return tuple(
        jnp.asarray(x)
        for x in (desc, pts, nrm, valid, poses, pi.astype(np.int32),
                  pj.astype(np.int32), np.ones(len(pi), bool))
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=16, help="frames (pairs = k(k-1)/2)")
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--d", type=int, default=256)
    p.add_argument("--m", type=int, default=256, help="max matches out")
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args(argv)

    import jax

    from bundletrack_tpu.matching.pairwise import match_pairs_batched
    from bundletrack_tpu.utils.timing import hard_sync

    inputs = make_inputs(args.k, args.n, args.d)

    def run(backend):
        fn = jax.jit(
            lambda *a: match_pairs_batched(
                *a, max_dist=0.02, max_normal_deg=45.0,
                max_matches=args.m, backend=backend,
            )
        )
        t0 = time.perf_counter()
        out = fn(*inputs)
        hard_sync(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*inputs)
        hard_sync(out)
        ms = (time.perf_counter() - t0) / args.reps * 1000
        print(f"[matcher] {backend}: {ms:.2f} ms/call (compile {compile_s:.1f}s)",
              file=sys.stderr)
        return out, ms

    out_x, ms_x = run("xla")
    out_p, ms_p = run("pallas")

    # correctness: identical match sets up to tie-breaks — compare the set of
    # (pair, a, b) triples
    def match_set(out):
        ia, ib, v = (np.asarray(x) for x in (out.idx_a, out.idx_b, out.valid))
        P = ia.shape[0]
        return {
            (p_, int(a), int(b))
            for p_ in range(P)
            for a, b, ok in zip(ia[p_], ib[p_], v[p_])
            if ok
        }
    sx, sp = match_set(out_x), match_set(out_p)
    inter = len(sx & sp)
    union = max(len(sx | sp), 1)
    agree = inter / union
    print(f"[matcher] agreement: {agree:.4f} ({len(sx)} xla vs {len(sp)} pallas matches)",
          file=sys.stderr)
    import json
    print(json.dumps({
        "xla_ms": round(ms_x, 2), "pallas_ms": round(ms_p, 2),
        "speedup": round(ms_x / ms_p, 2), "agreement": round(agree, 4),
    }))
    return ms_x, ms_p, agree


if __name__ == "__main__":
    main()
