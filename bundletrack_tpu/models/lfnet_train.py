"""Self-supervised LF-Net training step (pairs with known warps).

The reference trains LF-Net with a 1,200-line TF1 harness
(reference: lf-net-release/train_lfnet.py) on image pairs whose ground-truth
correspondence comes from depth + relative pose.  This module provides the
TPU-native training step with the same two core objectives:

  * detector repeatability — the score heatmap of image 2, warped into image
    1 through the ground-truth correspondence field, should match image 1's
    heatmap (reference's warped-score loss), and
  * descriptor contrastive loss — descriptors of corresponding keypoints
    should match; non-corresponding pairs should not (the reference uses a
    triplet loss over matched patches; InfoNCE over the in-batch keypoint set
    is the batched-TPU equivalent).

Pairs + warps come from any source; data/synthetic.py renders suitable
ground-truth sequences.  The step is pjit-able: see parallel/fleet.py for
the sharded fleet/training entry points.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from bundletrack_tpu.config import FrontendConfig
from bundletrack_tpu.frontend.detector_ops import transformer_crop
from bundletrack_tpu.frontend.lfnet import LFNet


class LFNetTrainBatch(NamedTuple):
    """A batch of image pairs with ground-truth correspondence.

    img1, img2:   [B, H, W, 1]
    warp12:       [B, H, W, 2] for each pixel of img1, its (x, y) in img2
    warp_valid:   [B, H, W] bool
    """

    img1: jnp.ndarray
    img2: jnp.ndarray
    warp12: jnp.ndarray
    warp_valid: jnp.ndarray


def _gather_bilinear(img, xy):
    """img [B, H, W, C], xy [B, N, 2] -> [B, N, C]."""
    B, H, W, C = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    dx = (x - x0)[..., None]
    dy = (y - y0)[..., None]
    b = jnp.arange(B)[:, None]
    p00 = img[b, y0, x0]
    p01 = img[b, y0, x0 + 1]
    p10 = img[b, y0 + 1, x0]
    p11 = img[b, y0 + 1, x0 + 1]
    return (
        p00 * (1 - dx) * (1 - dy)
        + p01 * dx * (1 - dy)
        + p10 * (1 - dx) * dy
        + p11 * dx * dy
    )


def lfnet_loss(
    params,
    model: LFNet,
    batch: LFNetTrainBatch,
    temperature=0.1,
    neg_mask_px: float = 8.0,
):
    """Two-term loss; see module docstring.

    InfoNCE negative hygiene (the r3 descriptor collapse traced to this):
      * batch rows MUST come from distinct worlds — rows sharing landmarks
        make the in-batch negatives false (the trainer guarantees this);
      * same-row negatives whose image-2 location lies within `neg_mask_px`
        of the anchor's true correspondent are masked out — their patches
        overlap the positive's and are legitimately similar, and punishing
        them forces pathological descriptor sharpness;
      * columns from invalid correspondences (garbage patches) are masked.
    """
    cfg = model.cfg
    B, H, W, _ = batch.img1.shape

    out1, ep1 = model.apply({"params": params}, batch.img1, return_endpoints=True)
    out2, ep2 = model.apply({"params": params}, batch.img2, return_endpoints=True)

    # --- detector repeatability ---------------------------------------
    heat2_in_1 = _gather_bilinear(ep2["max_heat"], batch.warp12.reshape(B, -1, 2))
    heat2_in_1 = heat2_in_1.reshape(B, H, W, 1)
    wmask = batch.warp_valid[..., None].astype(jnp.float32)
    det_loss = jnp.sum(wmask * (ep1["max_heat"] - heat2_in_1) ** 2) / (
        jnp.sum(wmask) + 1e-6
    )

    # --- descriptor InfoNCE over corresponding keypoints ----------------
    # keypoints from image 1 (stop-grad locations), their correspondents in 2
    kp1 = jax.lax.stop_gradient(out1.kpts_uv)  # [B, K, 2]
    corr = _gather_bilinear(batch.warp12, kp1)  # [B, K, 2] locations in img2
    kp_valid = out1.valid & (
        _gather_bilinear(
            batch.warp_valid[..., None].astype(jnp.float32), kp1
        )[..., 0]
        > 0.5
    )
    K = kp1.shape[1]
    batch_inds = jnp.repeat(jnp.arange(B, dtype=jnp.int32), K)
    # crop the correspondent patches with image-2's OWN predicted scale and
    # orientation at the warped locations — the same transform chain the
    # inference pipeline applies (LFNet.__call__), so the descriptor learns
    # invariance through the scale/ori heads rather than around them
    scale2 = _gather_bilinear(ep2["max_scale"][..., None], corr)[..., 0]
    ori2 = _gather_bilinear(ep2["ori_maps"], corr)
    ori2 = ori2 / jnp.maximum(
        jnp.linalg.norm(ori2, axis=-1, keepdims=True), 1e-6
    )
    patches2 = transformer_crop(
        ep2["photos_n"], cfg.patch_size, batch_inds, corr.reshape(-1, 2),
        kpts_scale=jax.lax.stop_gradient(scale2.reshape(-1)),
        kpts_ori=jax.lax.stop_gradient(ori2.reshape(-1, 2)),
    )
    # reuse the descriptor tower on the warped patches
    desc2 = model.apply({"params": params}, patches2, method=LFNet.describe_patches)
    d1 = out1.desc.reshape(B * K, -1)
    d2 = desc2
    sim = (d1 @ d2.T) / temperature  # [BK, BK]
    labels = jnp.arange(B * K)
    mask = kp_valid.reshape(-1)

    # negative hygiene (see docstring): mask near-duplicate same-row
    # negatives and invalid columns, keeping the diagonal
    corr_flat = corr.reshape(B * K, 2)
    row_id = batch_inds  # [BK]
    same_row = row_id[:, None] == row_id[None, :]
    cd2 = jnp.sum((corr_flat[:, None, :] - corr_flat[None, :, :]) ** 2, axis=-1)
    near_dup = same_row & (cd2 < neg_mask_px**2)
    bad_col = ~mask[None, :].astype(bool)
    off_diag = labels[:, None] != labels[None, :]
    neg_inf = jnp.asarray(-1e9, sim.dtype)
    sim = jnp.where(off_diag & (near_dup | bad_col), neg_inf, sim)

    ce = optax.softmax_cross_entropy_with_integer_labels(sim, labels)
    desc_loss = jnp.sum(ce * mask) / (jnp.sum(mask) + 1e-6)

    loss = det_loss + desc_loss
    return loss, {"det_loss": det_loss, "desc_loss": desc_loss}


def make_lfnet_train_step(model: LFNet, tx: optax.GradientTransformation):
    """Returns step(params, opt_state, batch) -> (params, opt_state, metrics)."""

    def step(params, opt_state, batch: LFNetTrainBatch):
        (loss, metrics), grads = jax.value_and_grad(lfnet_loss, has_aux=True)(
            params, model, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        return params, opt_state, metrics

    return step
