"""LF-Net-style learned keypoint frontend in Flax — detector + descriptor.

From-scratch JAX/Flax implementation of the reference's keypoint network
(reference: lf-net-release/models/mso_resnet_detector.py get_model:64-173
ConvOnlyResNet with per-scale score convs and an orientation head;
inference.py build_multi_scale_deep_detector_3DNMS:159-241 and
build_patch_extraction:243-262; models/simple_desc.py get_model:10-91).

Deviations from the reference (TPU-conscious, documented):
  * Scale pyramid defaults to 5 scales in [2^-1, 2^1] instead of 9 scales in
    [2^-3, 1]: the reference *upsamples* feature maps by 1/scale, which at
    scale 2^-3 means an 8x-upsampled conv (3200^2 for a 400^2 input) — far
    off the published 10 Hz envelope and hostile to TPU memory; a symmetric
    pyramid around 1.0 covers the same relative-scale range at bounded cost.
  * BatchNorm is replaced by bias-free GroupNorm(1) (=LayerNorm over HWC):
    inference-mode BN with running stats adds state without accuracy benefit
    at these widths, and instance-style norms jit cleanly.
  * Everything is channels-last NHWC bfloat16 on the conv path with f32
    normalization, sized so convs land on the MXU.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from bundletrack_tpu.config import FrontendConfig
from bundletrack_tpu.frontend.detector_ops import (
    end_of_frame_mask,
    instance_norm,
    non_max_suppression_mask,
    soft_argmax_2d,
    soft_max_and_argmax_1d,
    soft_nms_3d,
    top_k_keypoints,
    transformer_crop,
)
from bundletrack_tpu.frontend.interface import FrontendOutput


class FrozenBN(nn.Module):
    """Inference-mode batch norm with ported running statistics.

    Matches the reference's tf.nn.batch_normalization(inputs, moving_mean,
    moving_var, beta, gamma, 1e-3) (reference common/tf_layer_utils.py:130)
    so TF1-checkpoint-ported weights reproduce the original network
    tensor-for-tensor.  Stats/affine live in the param tree (filled by
    frontend/port_tf1.py; identity-initialized otherwise).
    """

    eps: float = 1e-3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


def _make_norm(kind: str, name: str):
    # norms always compute in f32 (mean/var reductions are precision
    # sensitive); the surrounding conv path may be bf16
    if kind == "bn":
        return FrozenBN(name=name)
    return nn.GroupNorm(num_groups=1, dtype=jnp.float32, name=name)


class ResBlock(nn.Module):
    """Pre-activation residual block (reference building_block,
    mso_resnet_detector.py:10-62)."""

    channels: int
    ksize: int = 3
    norm: str = "gn"
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _make_norm(self.norm, "pre_norm")(x)
        h = nn.relu(h)
        shortcut = x
        h = nn.Conv(self.channels, (self.ksize, self.ksize), dtype=self.dtype,
                    name="conv1")(h)
        h = _make_norm(self.norm, "mid_norm")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (self.ksize, self.ksize), dtype=self.dtype,
                    name="conv2")(h)
        return h + shortcut.astype(h.dtype)


class MSODetector(nn.Module):
    """Multi-Scale-Orientation detector (reference get_model:64-173)."""

    num_blocks: int = 3
    channels: int = 16
    ksize: int = 3
    num_scales: int = 5
    min_scale: float = 0.5
    max_scale: float = 2.0
    norm: str = "gn"
    dtype: type = jnp.float32  # conv-path compute dtype (bf16 on TPU)

    def scale_factors(self) -> np.ndarray:
        if self.num_scales == 1:
            return np.array([1.0], np.float32)
        return np.exp(
            np.linspace(
                np.log(self.max_scale), np.log(self.min_scale), self.num_scales
            )
        ).astype(np.float32)

    @nn.compact
    def __call__(self, photos):  # [B, H, W, 1]
        B, H, W, _ = photos.shape
        x = nn.Conv(self.channels, (self.ksize, self.ksize), dtype=self.dtype,
                    name="init_conv")(photos)
        for i in range(self.num_blocks):
            x = ResBlock(
                self.channels, self.ksize, norm=self.norm, dtype=self.dtype,
                name=f"block_{i+1}",
            )(x)
        x = _make_norm(self.norm, "final_norm")(x)
        feat_maps = nn.relu(x)  # f32 (post-norm)

        # the per-scale feature upsample (up to 2x H, 2x W) dominates the
        # forward's HBM traffic — resize and score-conv in the compute dtype
        feat_rs = feat_maps.astype(self.dtype)
        score_maps = []
        for i, s in enumerate(self.scale_factors()):
            inv_s = 1.0 / float(s)
            fh, fw = int(H * inv_s + 0.5), int(W * inv_s + 0.5)
            rs = jax.image.resize(feat_rs, (B, fh, fw, self.channels), "bilinear")
            sm = nn.Conv(1, (self.ksize, self.ksize), dtype=self.dtype,
                         name=f"score_conv_{i}")(rs)
            score_maps.append(sm.astype(jnp.float32))

        # orientation head: init to (cos, sin) = (1, 0)
        ori = nn.Conv(
            2,
            (self.ksize, self.ksize),
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.array(
                [1.0, 0.0], dtype
            ),
            name="ori_conv",
        )(feat_maps)
        ori = ori / jnp.maximum(
            jnp.linalg.norm(ori, axis=-1, keepdims=True), 1e-6
        )
        return score_maps, ori, feat_maps


class SimpleDesc(nn.Module):
    """Patch descriptor (reference simple_desc.py get_model:10-91)."""

    out_dim: int = 256
    init_channels: int = 64
    num_layers: int = 3
    ksize: int = 3
    norm: str = "gn"
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, patches):  # [N, P, P, C]
        x = patches
        for i in range(self.num_layers):
            x = nn.Conv(
                self.init_channels * (2 ** i),
                (self.ksize, self.ksize),
                strides=(2, 2),
                dtype=self.dtype,
                name=f"conv{i+1}",
            )(x)
            x = _make_norm(self.norm, f"norm{i+1}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x)
        x = _make_norm(self.norm, "fc1_norm")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        x = x.astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)


class LFNet(nn.Module):
    """Full detector -> 3D-NMS -> top-K -> oriented patches -> descriptor.

    Inference pipeline per reference build_multi_scale_deep_detector_3DNMS
    (inference.py:159-241) + build_patch_extraction (243-262).
    """

    cfg: FrontendConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if getattr(c, "bf16", False) else jnp.float32
        self.detector = MSODetector(
            num_blocks=c.net_block,
            channels=c.net_channel,
            ksize=c.conv_ksize,
            num_scales=c.net_num_scales,
            min_scale=c.net_min_scale,
            max_scale=c.net_max_scale,
            norm=c.norm,
            dtype=dtype,
        )
        self.descriptor = SimpleDesc(
            out_dim=c.desc_dim,
            init_channels=c.desc_net_channel,
            num_layers=c.desc_net_depth,
            ksize=c.desc_conv_ksize,
            norm=c.norm,
            dtype=dtype,
        )

    def describe_patches(self, patches):
        """Descriptor tower alone (used by the training step on warped patches)."""
        return self.descriptor(patches)

    def __call__(self, photos, return_endpoints: bool = False):
        # photos: [B, H, W, 1] grayscale in [0, 1]
        c = self.cfg
        B, H, W, _ = photos.shape
        photos_n = instance_norm(photos)
        score_maps, ori_maps, feat_maps = self.detector(photos_n)
        scale_factors = jnp.asarray(self.detector.scale_factors())

        logits = [
            jax.image.resize(instance_norm(sm), (B, H, W, 1), "bilinear")
            for sm in score_maps
        ]
        scale_logits = jnp.concatenate(logits, axis=-1)  # [B, H, W, S]

        heat = soft_nms_3d(scale_logits, ksize=c.sm_ksize, com_strength=c.com_strength)
        if c.soft_scale:
            max_heat, max_scale = soft_max_and_argmax_1d(
                heat, scale_factors, axis=-1,
                com1=c.score_com_strength, com2=c.scale_com_strength,
            )
            max_heat = max_heat[..., None]
        else:
            max_heat = jnp.max(heat, axis=-1, keepdims=True)
            max_scale = scale_factors[jnp.argmax(heat, axis=-1)]

        pad = (c.net_block * 2 + 2) * (c.conv_ksize // 2)
        max_heat = max_heat * end_of_frame_mask(H, W, pad)
        nms = non_max_suppression_mask(max_heat, c.nms_thresh, c.nms_ksize)
        scores = max_heat * nms.astype(max_heat.dtype) * end_of_frame_mask(
            H, W, c.crop_radius
        )

        kpts, kp_scores, valid = top_k_keypoints(scores, c.top_k)  # [B, K, 2]
        batch_inds = jnp.repeat(jnp.arange(B, dtype=jnp.int32), c.top_k)
        kpts_flat = kpts.reshape(-1, 2)
        xi = jnp.clip(kpts_flat[:, 0].astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(kpts_flat[:, 1].astype(jnp.int32), 0, H - 1)
        kp_scale = max_scale[batch_inds, yi, xi]
        kp_ori = ori_maps[batch_inds, yi, xi]

        if c.soft_kpts:
            local = transformer_crop(
                max_heat, c.kp_loc_size, batch_inds, kpts_flat, kpts_scale=kp_scale
            )
            dxdy = soft_argmax_2d(
                local, do_softmax=c.do_softmax_kp_refine, com=c.kp_com_strength
            )
            kpts_flat = kpts_flat + dxdy * kp_scale[:, None] * (c.kp_loc_size / 2.0)

        patches = transformer_crop(
            photos_n, c.patch_size, batch_inds, kpts_flat,
            kpts_scale=kp_scale, kpts_ori=kp_ori,
        )
        desc = self.descriptor(patches)

        out = FrontendOutput(
            kpts_uv=kpts_flat.reshape(B, c.top_k, 2),
            scores=kp_scores,
            desc=desc.reshape(B, c.top_k, -1),
            valid=valid,
        )
        if return_endpoints:
            return out, {
                "max_heat": max_heat,  # [B, H, W, 1]
                "max_scale": max_scale,  # [B, H, W]
                "ori_maps": ori_maps,  # [B, H, W, 2]
                "feat_maps": feat_maps,
                "photos_n": photos_n,
            }
        return out


def make_lfnet_apply(cfg: FrontendConfig, params):
    """Single-image apply fn with the pipeline's FrontendOutput contract."""
    model = LFNet(cfg)

    def apply(crop):  # [S, S, 1]
        out = model.apply({"params": params}, crop[None])
        return FrontendOutput(
            kpts_uv=out.kpts_uv[0],
            scores=out.scores[0],
            desc=out.desc[0],
            valid=out.valid[0],
        )

    return apply


def init_lfnet(cfg: FrontendConfig, key=None, init_size: int = 0):
    model = LFNet(cfg)
    if key is None:
        key = jax.random.PRNGKey(0)
    s = init_size or cfg.input_size
    dummy = jnp.zeros((1, s, s, 1), jnp.float32)
    params = model.init(key, dummy)["params"]
    return model, params


def save_params_npz(path: str, params) -> None:
    """Serialize an LF-Net param tree to one committable npz (~5 MB) —
    the role of the reference's TF1 checkpoint release."""
    from bundletrack_tpu.utils.params_io import save_params_npz as _save

    _save(path, params)


def load_params_npz(path: str, cfg: FrontendConfig):
    """Load params saved by save_params_npz; returns (model, params f32).

    cfg must describe the same architecture (net_*/desc_*/norm fields) the
    checkpoint was trained with; shapes are validated against a fresh init.
    """
    from bundletrack_tpu.utils.params_io import load_params_npz as _load

    model, like = init_lfnet(cfg, init_size=64)
    return model, _load(path, like)
