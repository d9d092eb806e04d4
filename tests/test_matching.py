import jax
import jax.numpy as jnp
import numpy as np

from bundletrack_tpu.matching import (
    descriptor_distances,
    match_pair,
    match_pairs_batched,
    init_mappoints,
    update_mappoints,
    propagate_matches,
    forget_frame_mappoints,
    MatchResult,
)

rng = np.random.RandomState(42)
EYE = jnp.eye(4)


def make_frame(n=64, d=32):
    desc = rng.randn(n, d).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    pts = rng.rand(n, 3).astype(np.float32)
    normals = np.zeros((n, 3), np.float32)
    normals[:, 2] = -1.0
    return desc, pts, normals


class TestDescriptorDistances:
    def test_matches_numpy(self):
        # L2-normalized descriptors (as the frontend produces)
        a = rng.randn(10, 16).astype(np.float32)
        b = rng.randn(12, 16).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        d = np.asarray(descriptor_distances(jnp.asarray(a), jnp.asarray(b)))
        ref = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d, ref, atol=0.03)  # bf16 matmul tolerance

    def test_batched(self):
        a = rng.randn(3, 10, 16).astype(np.float32)
        b = rng.randn(3, 12, 16).astype(np.float32)
        d = np.asarray(descriptor_distances(jnp.asarray(a), jnp.asarray(b)))
        assert d.shape == (3, 10, 12)


class TestMatchPair:
    def test_identity_matching(self):
        """A frame matched against a shuffled copy of itself recovers the permutation."""
        desc, pts, normals = make_frame(64)
        perm = rng.permutation(64)
        valid = jnp.ones(64, bool)
        res = match_pair(
            jnp.asarray(desc), jnp.asarray(pts), jnp.asarray(normals), valid, EYE,
            jnp.asarray(desc[perm]), jnp.asarray(pts[perm]), jnp.asarray(normals[perm]), valid, EYE,
            max_dist=0.05, max_normal_deg=45.0, max_matches=64,
        )
        assert bool(res.valid.all())
        ia, ib = np.asarray(res.idx_a), np.asarray(res.idx_b)
        assert (perm[ib] == ia).all()

    def test_distance_gate_blocks(self):
        desc, pts, normals = make_frame(32)
        valid = jnp.ones(32, bool)
        far_pts = pts + 10.0  # all candidates outside max_dist
        res = match_pair(
            jnp.asarray(desc), jnp.asarray(pts), jnp.asarray(normals), valid, EYE,
            jnp.asarray(desc), jnp.asarray(far_pts), jnp.asarray(normals), valid, EYE,
            max_dist=0.05, max_normal_deg=45.0, max_matches=32,
        )
        assert not bool(res.valid.any())

    def test_normal_gate_blocks(self):
        desc, pts, normals = make_frame(32)
        valid = jnp.ones(32, bool)
        flipped = -normals
        res = match_pair(
            jnp.asarray(desc), jnp.asarray(pts), jnp.asarray(normals), valid, EYE,
            jnp.asarray(desc), jnp.asarray(pts), jnp.asarray(flipped), valid, EYE,
            max_dist=0.05, max_normal_deg=45.0, max_matches=32,
        )
        assert not bool(res.valid.any())

    def test_invalid_kpts_excluded(self):
        desc, pts, normals = make_frame(32)
        valid_a = jnp.asarray(np.arange(32) < 16)
        valid_b = jnp.ones(32, bool)
        res = match_pair(
            jnp.asarray(desc), jnp.asarray(pts), jnp.asarray(normals), valid_a, EYE,
            jnp.asarray(desc), jnp.asarray(pts), jnp.asarray(normals), valid_b, EYE,
            max_dist=0.05, max_normal_deg=45.0, max_matches=32,
        )
        ia = np.asarray(res.idx_a)[np.asarray(res.valid)]
        assert (ia < 16).all() and len(ia) == 16


class TestMatchPairsBatched:
    def test_pair_axis(self):
        desc, pts, normals = make_frame(32)
        K = 4
        descs = jnp.asarray(np.stack([desc] * K))
        ptss = jnp.asarray(np.stack([pts] * K))
        nrms = jnp.asarray(np.stack([normals] * K))
        kp_valid = jnp.ones((K, 32), bool)
        poses = jnp.stack([EYE] * K)
        pair_i = jnp.asarray([0, 0, 1], jnp.int32)
        pair_j = jnp.asarray([1, 2, 2], jnp.int32)
        pair_valid = jnp.asarray([True, True, False])
        res = match_pairs_batched(
            descs, ptss, nrms, kp_valid, poses, pair_i, pair_j, pair_valid,
            max_dist=0.05, max_normal_deg=45.0, max_matches=32,
        )
        v = np.asarray(res.valid)
        assert v[0].all() and v[1].all() and not v[2].any()


class TestMapPoints:
    def _matches(self, pairs, m=8):
        ia = np.zeros(m, np.int32)
        ib = np.zeros(m, np.int32)
        valid = np.zeros(m, bool)
        for k, (a, b) in enumerate(pairs):
            ia[k], ib[k], valid[k] = a, b, True
        return MatchResult(jnp.asarray(ia), jnp.asarray(ib), jnp.asarray(valid))

    def test_create_and_propagate(self):
        t = init_mappoints(capacity=16, num_slots=4, num_kpts=32)
        # slot0 kp3 <-> slot1 kp7
        t = update_mappoints(t, 0, 1, self._matches([(3, 7)]))
        # slot1 kp7 <-> slot2 kp9 joins the same landmark
        t = update_mappoints(t, 1, 2, self._matches([(7, 9)]))
        prop = propagate_matches(t, 0, 2, max_matches=8)
        v = np.asarray(prop.valid)
        assert v.sum() == 1
        assert np.asarray(prop.idx_a)[v][0] == 3
        assert np.asarray(prop.idx_b)[v][0] == 9

    def test_no_duplicate_landmarks(self):
        t = init_mappoints(16, 4, 32)
        m = self._matches([(1, 2), (3, 4)])
        t = update_mappoints(t, 0, 1, m)
        t = update_mappoints(t, 0, 1, m)  # same matches again: no new landmarks
        assert int(t.num_landmarks) == 2

    def test_forget(self):
        t = init_mappoints(16, 4, 32)
        t = update_mappoints(t, 0, 1, self._matches([(1, 2)]))
        t = forget_frame_mappoints(t, 1)
        prop = propagate_matches(t, 0, 1, max_matches=8)
        assert not bool(prop.valid.any())
        # rev for slot 1 cleared
        assert (np.asarray(t.rev[1]) == -1).all()

    def test_capacity_overflow_drops(self):
        t = init_mappoints(capacity=2, num_slots=2, num_kpts=32)
        m = self._matches([(0, 0), (1, 1), (2, 2), (3, 3)])
        t = update_mappoints(t, 0, 1, m)
        assert int(t.num_landmarks) == 2  # only capacity landmarks kept
