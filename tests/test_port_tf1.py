"""Tests: TF1 LF-Net weight porting (name map, shapes, frozen-BN numerics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundletrack_tpu.config import FrontendConfig
from bundletrack_tpu.frontend.lfnet import LFNet, FrozenBN, init_lfnet
from bundletrack_tpu.frontend.port_tf1 import (
    PortError,
    check_ported_params,
    port_lfnet_params,
)

CFG = FrontendConfig(
    kind="lfnet", input_size=32, top_k=16, desc_dim=32, net_channel=8,
    net_num_scales=3, sm_ksize=5, desc_net_channel=16, norm="bn",
)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def _fake_tf_vars(cfg, bn_style="layers", rng=None):
    """Fabricate a TF1 variable dict shaped like the reference checkpoint,
    by reverse-mapping a freshly initialized param tree."""
    rng = rng or np.random.RandomState(0)
    _, params = init_lfnet(cfg)
    flat = _flatten(jax.tree.map(np.asarray, params))

    def bn_name(scope, ours):
        if bn_style == "layers":
            m = {"mean": "moving_mean", "var": "moving_variance",
                 "scale": "gamma", "bias": "beta"}
            return f"{scope}/{m[ours]}"
        m = {"mean": "moments/Squeeze/ExponentialMovingAverage",
             "var": "moments/Squeeze_1/ExponentialMovingAverage",
             "scale": "gamma", "bias": "beta"}
        return f"{scope}/{m[ours]}"

    tf_vars = {}
    for key, arr in flat.items():
        parts = key.split("/")
        val = rng.randn(*arr.shape).astype(np.float32)
        if parts[-1] == "var":
            val = np.abs(val) + 0.5
        if parts[0] == "detector":
            scope = "ConvOnlyResNet"
            if parts[1] == "init_conv" or parts[1].startswith("score_conv") or parts[1] == "ori_conv":
                name = f"{scope}/{parts[1]}/" + ("weights" if parts[-1] == "kernel" else "biases")
            elif parts[1] == "final_norm":
                name = bn_name(f"{scope}/fin-bn", parts[-1])
            else:  # block_{i}
                i = parts[1].split("_")[1]
                sub = parts[2]
                if sub in ("conv1", "conv2"):
                    name = f"{scope}/block-{i}/{sub}/" + (
                        "weights" if parts[-1] == "kernel" else "biases"
                    )
                else:
                    bn = "pre-bn" if sub == "pre_norm" else "mid-bn"
                    name = bn_name(f"{scope}/block-{i}/{bn}", parts[-1])
        else:  # descriptor
            scope = "SimpleDesc"
            if parts[1].startswith("conv") or parts[1] in ("fc1", "fc2"):
                name = f"{scope}/{parts[1]}/" + (
                    "weights" if parts[-1] == "kernel" else "biases"
                )
            elif parts[1] == "fc1_norm":
                name = bn_name(f"{scope}/fc1/bn", parts[-1])
            else:  # norm{i}
                i = parts[1][-1]
                name = bn_name(f"{scope}/conv{i}/bn", parts[-1])
        tf_vars[name + ":0"] = val
    return tf_vars


class TestPortTF1:
    @pytest.mark.parametrize("bn_style", ["layers", "ema"])
    def test_port_shapes_and_forward(self, bn_style):
        tf_vars = _fake_tf_vars(CFG, bn_style)
        params = port_lfnet_params(tf_vars, CFG)
        check_ported_params(params, CFG)
        model = LFNet(CFG)
        out = model.apply(
            {"params": params}, jnp.zeros((1, 32, 32, 1), jnp.float32)
        )
        assert out.desc.shape == (1, CFG.top_k, CFG.desc_dim)
        assert np.all(np.isfinite(np.asarray(out.desc)))

    def test_missing_variable_raises(self):
        tf_vars = _fake_tf_vars(CFG)
        del tf_vars["ConvOnlyResNet/ori_conv/weights:0"]
        with pytest.raises(PortError, match="ori_conv"):
            port_lfnet_params(tf_vars, CFG)

    def test_gn_config_rejected(self):
        cfg = FrontendConfig(kind="lfnet", norm="gn")
        with pytest.raises(PortError, match="bn"):
            port_lfnet_params({}, cfg)

    def test_frozen_bn_matches_tf_formula(self):
        """FrozenBN == tf.nn.batch_normalization(x, mean, var, beta, gamma, 1e-3)."""
        rng = np.random.RandomState(1)
        x = rng.randn(2, 4, 4, 3).astype(np.float32)
        mean = rng.randn(3).astype(np.float32)
        var = (np.abs(rng.randn(3)) + 0.5).astype(np.float32)
        gamma = rng.randn(3).astype(np.float32)
        beta = rng.randn(3).astype(np.float32)
        params = {"mean": mean, "var": var, "scale": gamma, "bias": beta}
        got = FrozenBN().apply({"params": params}, jnp.asarray(x))
        want = (x - mean) / np.sqrt(var + 1e-3) * gamma + beta
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)

    def test_affine_only_bn_gets_identity_stats(self):
        tf_vars = _fake_tf_vars(CFG)
        # strip the running stats of one scope -> identity stats expected
        drop = [k for k in tf_vars if "fin-bn/moving" in k]
        assert drop
        for k in drop:
            del tf_vars[k]
        params = port_lfnet_params(tf_vars, CFG)
        np.testing.assert_array_equal(
            params["detector"]["final_norm"]["mean"], 0.0
        )
        np.testing.assert_array_equal(
            params["detector"]["final_norm"]["var"], 1.0
        )
