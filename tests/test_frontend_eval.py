"""Frontend quality metrics + LF-Net npz weight roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp

from bundletrack_tpu.config import FrontendConfig
from bundletrack_tpu.data import render_synthetic_sequence
from bundletrack_tpu.eval import evaluate_frontend


class TestFrontendEval:
    def test_classical_metrics_sane(self):
        seq = render_synthetic_sequence(num_frames=4, H=120, W=160,
                                        orbit_deg_per_frame=2.0)
        cfg = FrontendConfig(kind="classical", top_k=128)
        m = evaluate_frontend(seq, cfg, gap=1, eps_px=3.0)
        # Shi-Tomasi corners on a textured cube under 2 deg motion: most
        # keypoints should re-detect nearby, and patch descriptors should
        # produce mostly-correct mutual matches
        assert m["repeatability"] > 0.5, m
        assert m["inlier_rate"] > 0.5, m
        assert m["n_matches"] > 20, m

    def test_identity_pair_is_perfect(self):
        seq = render_synthetic_sequence(num_frames=2, H=96, W=128,
                                        orbit_deg_per_frame=0.0)
        cfg = FrontendConfig(kind="classical", top_k=64)
        m = evaluate_frontend(seq, cfg, gap=1, eps_px=2.0)
        assert m["repeatability"] > 0.95
        assert m["inlier_rate"] > 0.95


class TestLfnetNpz:
    def _tiny_cfg(self):
        # bf16=False: this test asserts the fp16 WEIGHT quantization of the
        # npz roundtrip moves nothing; on a random-init net (near-flat score
        # map, argmax ties everywhere) bf16 COMPUTE noise flips top-K picks
        # and would test the wrong thing
        return FrontendConfig(
            kind="lfnet", input_size=64, top_k=32, desc_dim=32,
            net_channel=8, desc_net_channel=16, net_num_scales=3, bf16=False,
        )

    def test_roundtrip(self, tmp_path):
        from bundletrack_tpu.frontend import (
            init_lfnet, load_params_npz, save_params_npz,
        )

        cfg = self._tiny_cfg()
        model, params = init_lfnet(cfg, key=jax.random.PRNGKey(1))
        p = str(tmp_path / "w.npz")
        save_params_npz(p, params)
        model2, params2 = load_params_npz(p, cfg)
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 1))
        o1 = model.apply({"params": params}, x)
        o2 = model2.apply({"params": params2}, x)
        # fp16 weight quantization: descriptors stay close, keypoints match
        np.testing.assert_allclose(
            np.asarray(o1.kpts_uv), np.asarray(o2.kpts_uv), atol=0.5
        )
        assert float(jnp.mean(jnp.sum(o1.desc * o2.desc, -1))) > 0.99

    def test_shape_mismatch_rejected(self, tmp_path):
        import pytest

        from bundletrack_tpu.frontend import (
            init_lfnet, load_params_npz, save_params_npz,
        )

        cfg = self._tiny_cfg()
        _, params = init_lfnet(cfg)
        p = str(tmp_path / "w.npz")
        save_params_npz(p, params)
        with pytest.raises((KeyError, ValueError)):
            load_params_npz(p, cfg.__class__(kind="lfnet", desc_dim=64))
