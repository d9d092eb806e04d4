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
    """Structured inputs with ground-truth correspondence.

    Every frame observes the same underlying landmarks through descriptor
    noise (keeping realistic match margins — i.i.d. random descriptors make
    ALL distances ~2.0 and winner selection degenerates to ulp-level
    accumulation-order ties, which measures nothing).  Frame k's keypoint i
    is landmark perm[k, i]; ground truth for pair (a, b) is
    perm[a, i] == perm[b, j].
    """
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    base_desc = rng.randn(N, D).astype(np.float32)
    base_pts = rng.rand(N, 3).astype(np.float32) * 0.2
    base_nrm = rng.randn(N, 3).astype(np.float32)
    base_nrm /= np.linalg.norm(base_nrm, axis=-1, keepdims=True)

    perm = np.stack([rng.permutation(N) for _ in range(K)])  # [K, N]
    desc = base_desc[perm] + 0.35 * rng.randn(K, N, D).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    pts = base_pts[perm] + 0.002 * rng.randn(K, N, 3).astype(np.float32)
    nrm = base_nrm[perm]
    valid = rng.rand(K, N) < 0.9
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (K, 4, 4)).copy()
    poses[:, :3, 3] = 0.002 * rng.randn(K, 3)
    pi, pj = np.triu_indices(K, k=1)
    arrays = tuple(
        jnp.asarray(x)
        for x in (desc, pts, nrm, valid, poses, pi.astype(np.int32),
                  pj.astype(np.int32), np.ones(len(pi), bool))
    )
    return arrays, perm, (pi, pj)


def main(argv=None, print_json: bool = True):
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

    inputs, perm, (pi, pj) = make_inputs(args.k, args.n, args.d)

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

    # correctness: precision of each backend against the known landmark
    # correspondence, plus set agreement between backends
    def match_set(out):
        ia, ib, v = (np.asarray(x) for x in (out.idx_a, out.idx_b, out.valid))
        P = ia.shape[0]
        return {
            (p_, int(a), int(b))
            for p_ in range(P)
            for a, b, ok in zip(ia[p_], ib[p_], v[p_])
            if ok
        }

    def gt_precision(s):
        ok = sum(1 for (p_, a, b) in s if perm[pi[p_], a] == perm[pj[p_], b])
        return ok / max(len(s), 1)

    sx, sp = match_set(out_x), match_set(out_p)
    inter = len(sx & sp)
    union = max(len(sx | sp), 1)
    agree = inter / union
    prec_x, prec_p = gt_precision(sx), gt_precision(sp)
    print(f"[matcher] agreement: {agree:.4f} ({len(sx)} xla vs {len(sp)} pallas"
          f" matches); gt precision xla={prec_x:.4f} pallas={prec_p:.4f}",
          file=sys.stderr)
    import json
    result = {
        "xla_ms": round(ms_x, 2), "pallas_ms": round(ms_p, 2),
        "speedup": round(ms_x / ms_p, 2), "agreement": round(agree, 4),
        "gt_precision_xla": round(prec_x, 4),
        "gt_precision_pallas": round(prec_p, 4),
    }
    if print_json:
        print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
