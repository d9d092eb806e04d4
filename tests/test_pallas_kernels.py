"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU in bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from bundletrack_tpu.matching.pairwise import (
    descriptor_distances,
    geometric_gate,
    mutual_nearest,
)
from bundletrack_tpu.pallas_kernels import fused_mutual_match

rng = np.random.RandomState(0)


def make_pair(P=2, N=64, D=32):
    desc = rng.randn(P, 2, N, D).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    pts = rng.rand(P, 2, N, 3).astype(np.float32)
    nrm = np.zeros((P, 2, N, 3), np.float32)
    nrm[..., 2] = -1.0
    valid = np.ones((P, 2, N), bool)
    return desc, pts, nrm, valid


class TestFusedMatchKernel:
    def test_matches_xla_reference(self):
        P, N, D = 2, 64, 32
        desc, pts, nrm, valid = make_pair(P, N, D)
        # make side B a shuffled copy of A so there are true matches
        for p in range(P):
            perm = rng.permutation(N)
            desc[p, 1] = desc[p, 0][perm] + 0.001 * rng.randn(N, D)
            pts[p, 1] = pts[p, 0][perm]
        args = dict(max_dist=0.05, max_normal_deg=45.0)

        best_b, dist, mutual = fused_mutual_match(
            jnp.asarray(desc[:, 0]), jnp.asarray(desc[:, 1]),
            jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
            jnp.asarray(nrm[:, 0]), jnp.asarray(nrm[:, 1]),
            jnp.asarray(valid[:, 0]), jnp.asarray(valid[:, 1]),
            interpret=True, **args,
        )

        # XLA reference path
        eye = jnp.eye(4)
        for p in range(P):
            d = descriptor_distances(jnp.asarray(desc[p, 0]), jnp.asarray(desc[p, 1]))
            g = geometric_gate(
                jnp.asarray(pts[p, 0]), jnp.asarray(nrm[p, 0]), eye,
                jnp.asarray(pts[p, 1]), jnp.asarray(nrm[p, 1]), eye,
                args["max_dist"], args["max_normal_deg"],
            )
            mut_ref = np.asarray(mutual_nearest(d, g))
            ref_rows = mut_ref.any(axis=1)
            got_rows = np.asarray(mutual[p])
            # row-level agreement (tie-handling may differ slightly)
            assert (ref_rows == got_rows).mean() > 0.97
            # where both agree a match exists, the partner must be identical
            both = ref_rows & got_rows
            ref_partner = mut_ref.argmax(axis=1)
            np.testing.assert_array_equal(
                ref_partner[both], np.asarray(best_b[p])[both]
            )

    def test_gating_blocks_all(self):
        P, N, D = 1, 32, 16
        desc, pts, nrm, valid = make_pair(P, N, D)
        pts_far = pts[:, 1] + 10.0
        _, _, mutual = fused_mutual_match(
            jnp.asarray(desc[:, 0]), jnp.asarray(desc[:, 1]),
            jnp.asarray(pts[:, 0]), jnp.asarray(pts_far),
            jnp.asarray(nrm[:, 0]), jnp.asarray(nrm[:, 1]),
            jnp.asarray(valid[:, 0]), jnp.asarray(valid[:, 1]),
            max_dist=0.05, max_normal_deg=45.0, interpret=True,
        )
        assert not bool(np.asarray(mutual).any())

    def test_invalid_kpts_excluded(self):
        P, N, D = 1, 32, 16
        desc, pts, nrm, valid = make_pair(P, N, D)
        valid_a = valid[:, 0].copy()
        valid_a[0, 16:] = False
        _, _, mutual = fused_mutual_match(
            jnp.asarray(desc[:, 0]), jnp.asarray(desc[:, 0]),
            jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 0]),
            jnp.asarray(nrm[:, 0]), jnp.asarray(nrm[:, 0]),
            jnp.asarray(valid_a), jnp.asarray(valid[:, 1]),
            max_dist=0.05, max_normal_deg=45.0, interpret=True,
        )
        m = np.asarray(mutual[0])
        assert m[:16].all() and not m[16:].any()
