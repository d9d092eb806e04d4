"""TF1 LF-Net checkpoint -> Flax param porting.

The reference serves TF1 weights (reference: lf-net-release/run_server.py
saver.restore:120-134; variable scopes from models/mso_resnet_detector.py
get_model:64-173 — 'ConvOnlyResNet/{init_conv, block-{i}/{pre-bn, conv1,
mid-bn, conv2}, fin-bn, score_conv_{i}, ori_conv}' — and
models/simple_desc.py get_model:10-91 — 'SimpleDesc/{conv{i}, fc1, fc2}';
conv/fc variables are named weights/biases,
common/tf_layer_utils.py:391-392).

No TensorFlow ships in this environment, so the porting boundary is a plain
``{tf_variable_name: np.ndarray}`` dict.  Produce it offline in any TF1 env:

    import tensorflow as tf, numpy as np
    ckpt = tf.train.latest_checkpoint(model_dir)
    reader = tf.train.NewCheckpointReader(ckpt)
    arrs = {n: reader.get_tensor(n) for n in
            reader.get_variable_to_shape_map()}
    np.savez("lfnet_tf1.npz", **arrs)

then load with ``port_lfnet_params(dict(np.load("lfnet_tf1.npz")), cfg)``.

Layouts match directly: TF conv kernels are HWIO, the same as Flax nn.Conv;
dense kernels are (in, out) in both.  Batch-norm running statistics port
into FrozenBN params (use FrontendConfig(norm="bn") so the network applies
the reference's inference-mode tf.nn.batch_normalization exactly).  Both
TF1 BN variable stylings are handled: tf.layers (gamma/beta/moving_mean/
moving_variance) and the repo's custom EMA path (gamma/beta +
moments/Squeeze{,_1}/ExponentialMovingAverage).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


class PortError(ValueError):
    pass


def _clean(name: str) -> str:
    """Strip ':0' suffixes and leading slashes from a TF variable name."""
    name = name.split(":")[0]
    return name.strip("/")


def _bn_tree(prefix: str, vars_: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Collect FrozenBN params {mean, var, scale, bias} under a TF BN scope."""
    out = {}
    styles = {
        "mean": [f"{prefix}/moving_mean", f"{prefix}/moments/Squeeze/ExponentialMovingAverage"],
        "var": [f"{prefix}/moving_variance", f"{prefix}/moments/Squeeze_1/ExponentialMovingAverage"],
        "scale": [f"{prefix}/gamma"],
        "bias": [f"{prefix}/beta"],
    }
    for ours, candidates in styles.items():
        for c in candidates:
            if c in vars_:
                out[ours] = np.asarray(vars_[c], np.float32)
                break
    if set(out) == {"scale", "bias"}:
        # affine-only BN (stats folded elsewhere / not exported): identity stats
        out["mean"] = np.zeros_like(out["bias"])
        out["var"] = np.ones_like(out["scale"])
    if set(out) != {"mean", "var", "scale", "bias"}:
        raise PortError(f"incomplete batch-norm scope '{prefix}': found {sorted(out)}")
    return out


def _conv_tree(prefix: str, vars_: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    w = vars_.get(f"{prefix}/weights")
    if w is None:
        raise PortError(f"missing conv/fc kernel '{prefix}/weights'")
    out = {"kernel": np.asarray(w, np.float32)}
    b = vars_.get(f"{prefix}/biases")
    if b is not None:
        out["bias"] = np.asarray(b, np.float32)
    return out


def port_lfnet_params(
    tf_vars: Mapping[str, np.ndarray],
    cfg,
    detector_scope: str = "ConvOnlyResNet",
    descriptor_scope: str = "SimpleDesc",
) -> dict:
    """Map a TF1 LF-Net variable dict to this package's LFNet param tree.

    cfg: FrontendConfig with norm="bn" (frozen running stats).  Returns the
    params pytree accepted by ``LFNet(cfg).apply({"params": params}, ...)``.
    Raises PortError listing anything missing.
    """
    if cfg.norm != "bn":
        raise PortError(
            'ported weights need FrontendConfig(norm="bn") — the reference '
            "network uses batch norm; GroupNorm params cannot hold its stats"
        )
    vars_ = {_clean(k): np.asarray(v) for k, v in tf_vars.items()}
    det = detector_scope
    desc = descriptor_scope

    detector: Dict[str, dict] = {}
    detector["init_conv"] = _conv_tree(f"{det}/init_conv", vars_)
    for i in range(1, cfg.net_block + 1):
        blk = f"{det}/block-{i}"
        detector[f"block_{i}"] = {
            "pre_norm": _bn_tree(f"{blk}/pre-bn", vars_),
            "conv1": _conv_tree(f"{blk}/conv1", vars_),
            "mid_norm": _bn_tree(f"{blk}/mid-bn", vars_),
            "conv2": _conv_tree(f"{blk}/conv2", vars_),
        }
    detector["final_norm"] = _bn_tree(f"{det}/fin-bn", vars_)
    for i in range(cfg.net_num_scales):
        detector[f"score_conv_{i}"] = _conv_tree(f"{det}/score_conv_{i}", vars_)
    detector["ori_conv"] = _conv_tree(f"{det}/ori_conv", vars_)

    descriptor: Dict[str, dict] = {}
    for i in range(1, cfg.desc_net_depth + 1):
        descriptor[f"conv{i}"] = _conv_tree(f"{desc}/conv{i}", vars_)
        descriptor[f"norm{i}"] = _bn_tree(f"{desc}/conv{i}/bn", vars_)
    descriptor["fc1"] = _conv_tree(f"{desc}/fc1", vars_)
    descriptor["fc1_norm"] = _bn_tree(f"{desc}/fc1/bn", vars_)
    descriptor["fc2"] = _conv_tree(f"{desc}/fc2", vars_)

    return {"detector": detector, "descriptor": descriptor}


def check_ported_params(params: dict, cfg) -> None:
    """Shape-check a ported tree against a freshly initialized LFNet.

    Raises PortError on any mismatch (path, got, want).
    """
    import jax

    from bundletrack_tpu.frontend.lfnet import init_lfnet

    _, ref = init_lfnet(cfg)
    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_flat = dict(
        ("/".join(getattr(k, "key", str(k)) for k in path), np.asarray(v).shape)
        for path, v in jax.tree_util.tree_flatten_with_path(params)[0]
    )
    errors = []
    for path, leaf in ref_flat:
        key = "/".join(getattr(k, "key", str(k)) for k in path)
        if key not in got_flat:
            errors.append(f"missing param {key}")
        elif got_flat[key] != leaf.shape:
            errors.append(f"shape mismatch {key}: got {got_flat[key]}, want {leaf.shape}")
    for key in got_flat:
        if not any(
            "/".join(getattr(k, "key", str(k)) for k in path) == key
            for path, _ in ref_flat
        ):
            errors.append(f"unexpected param {key}")
    if errors:
        raise PortError("; ".join(errors))
