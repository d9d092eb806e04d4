import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bundletrack_tpu.config import FrontendConfig
from bundletrack_tpu.frontend.detector_ops import (
    instance_norm,
    soft_nms_3d,
    soft_max_and_argmax_1d,
    non_max_suppression_mask,
    top_k_keypoints,
    transformer_crop,
    soft_argmax_2d,
)
from bundletrack_tpu.frontend.lfnet import LFNet, init_lfnet
from bundletrack_tpu.models import LFNetTrainBatch, make_lfnet_train_step, lfnet_loss

rng = np.random.RandomState(0)

SMALL = FrontendConfig(
    kind="lfnet",
    input_size=64,
    top_k=32,
    desc_dim=64,
    net_channel=8,
    net_num_scales=3,
    sm_ksize=5,
    desc_net_channel=16,
)


class TestDetectorOps:
    def test_instance_norm(self):
        x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32)) * 5 + 3
        y = np.asarray(instance_norm(x))
        assert abs(y.mean()) < 0.1
        assert abs(y.std() - 1.0) < 0.1

    def test_soft_nms_3d_peaks(self):
        x = np.zeros((1, 16, 16, 3), np.float32)
        x[0, 8, 8, 1] = 5.0  # single dominant peak
        y = np.asarray(soft_nms_3d(jnp.asarray(x), ksize=5, com_strength=10.0))
        assert y[0, 8, 8, 1] > 0.9
        assert y[0, 8, 9, 1] < 0.1

    def test_soft_argmax_matches_hard(self):
        # values with guaranteed separation so the softmax is near-hard
        vals = np.arange(2 * 4 * 4 * 5, dtype=np.float32) * 0.07
        rng.shuffle(vals)
        x = jnp.asarray(vals.reshape(2, 4, 4, 5))
        idx_vals = jnp.asarray(np.linspace(0.5, 2.0, 5).astype(np.float32))
        mx, amx = soft_max_and_argmax_1d(x, idx_vals, com1=500.0, com2=500.0)
        np.testing.assert_allclose(np.asarray(mx), np.asarray(x).max(-1), atol=1e-3)
        hard = np.asarray(idx_vals)[np.asarray(x).argmax(-1)]
        np.testing.assert_allclose(np.asarray(amx), hard, atol=1e-2)

    def test_nms_mask(self):
        x = np.zeros((1, 10, 10, 1), np.float32)
        x[0, 5, 5, 0] = 1.0
        x[0, 5, 6, 0] = 0.5
        m = np.asarray(non_max_suppression_mask(jnp.asarray(x), 0.0, 3))
        assert m[0, 5, 5, 0]
        assert not m[0, 5, 6, 0]

    def test_topk(self):
        x = np.zeros((1, 8, 8, 1), np.float32)
        x[0, 2, 3, 0] = 2.0
        x[0, 6, 1, 0] = 1.0
        kpts, scores, valid = top_k_keypoints(jnp.asarray(x), 4)
        k = np.asarray(kpts[0])
        assert (k[0] == [3, 2]).all()
        assert (k[1] == [1, 6]).all()
        assert np.asarray(valid[0]).sum() == 2

    def test_transformer_crop_identity(self):
        img = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
        kp = jnp.asarray([[16.0, 16.0]])
        p = transformer_crop(img, 8, jnp.asarray([0]), kp)
        # center pixel of patch == image at keypoint
        c = np.asarray(p[0, 4, 4, 0])
        # grid linspace(-1,1,8)*4 -> offset ~0.57 px at index 4; allow slack
        assert abs(c - np.asarray(img)[0, 16, 16, 0]) < 0.3

    def test_soft_argmax_2d_offset(self):
        p = np.zeros((1, 9, 9, 1), np.float32)
        p[0, 4, 6, 0] = 10.0  # peak right of center
        d = np.asarray(soft_argmax_2d(jnp.asarray(p), com=50.0))[0]
        assert d[0] > 0.3 and abs(d[1]) < 0.1


class TestLFNet:
    @pytest.fixture(scope="class")
    def net(self):
        model, params = init_lfnet(SMALL)
        return model, params

    def test_forward_shapes(self, net):
        model, params = net
        img = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32))
        out = model.apply({"params": params}, img)
        assert out.kpts_uv.shape == (1, 32, 2)
        assert out.desc.shape == (1, 32, 64)
        norms = np.asarray(jnp.linalg.norm(out.desc, axis=-1))
        np.testing.assert_allclose(norms[np.asarray(out.valid)], 1.0, atol=1e-4)

    def test_jit_forward(self, net):
        model, params = net
        img = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32))
        f = jax.jit(lambda p, x: model.apply({"params": p}, x))
        out = f(params, img)
        assert out.kpts_uv.shape == (2, 32, 2)

    def test_keypoints_repeatable_under_shift(self, net):
        """Integer-shifted image -> keypoints shift accordingly (conv equivariance)."""
        model, params = net
        base = rng.rand(80, 80).astype(np.float32)
        img1 = base[8:72, 8:72][None, :, :, None]
        img2 = base[12:76, 8:72][None, :, :, None]  # shifted 4 px down
        o1 = model.apply({"params": params}, jnp.asarray(img1))
        o2 = model.apply({"params": params}, jnp.asarray(img2))
        k1 = np.asarray(o1.kpts_uv[0])[np.asarray(o1.valid[0])]
        k2 = np.asarray(o2.kpts_uv[0])[np.asarray(o2.valid[0])] + [0, 4]
        # most of k2 should appear in k1 within 2 px
        if len(k1) and len(k2):
            d = np.abs(k1[:, None] - k2[None]).sum(-1).min(1)
            interior = k1[:, 1] < 50  # shifted content region
            assert (d[interior] < 2.0).mean() > 0.5


class TestLFNetTraining:
    def test_train_step_reduces_loss(self):
        model, params = init_lfnet(SMALL)
        B, H, W = 2, 64, 64
        img = rng.rand(B, H, W, 1).astype(np.float32)
        # identity warp: img2 == img1
        gx, gy = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
        warp = np.broadcast_to(np.stack([gx, gy], -1)[None], (B, H, W, 2)).copy()
        batch = LFNetTrainBatch(
            img1=jnp.asarray(img),
            img2=jnp.asarray(img),
            warp12=jnp.asarray(warp),
            warp_valid=jnp.ones((B, H, W), bool),
        )
        tx = optax.adam(1e-3)
        step = jax.jit(make_lfnet_train_step(model, tx))
        opt_state = tx.init(params)
        losses = []
        for i in range(3):
            params, opt_state, metrics = step(params, opt_state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] <= losses[0] + 1e-3
