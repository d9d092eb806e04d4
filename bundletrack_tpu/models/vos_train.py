"""VOS training step: cross-entropy over transductively propagated labels.

The reference trains VOSNet with PyTorch DistributedDataParallel (NCCL) on
DAVIS clips: features of earlier frames + their ground-truth labels predict
the current frame's label by the same attention used at inference, and a
CrossEntropy loss is taken against the ground truth (reference:
transductive-vos.pytorch/main.py:57-135, lib/loss.py:31-57 — the only
distributed-training code in the reference).

TPU-native version: one jitted step over a [B, T, H, W, 3] clip batch; data
parallelism is a sharding annotation over the batch axis (see
parallel/fleet.py make_sharded_vos_train_step) instead of DDP — XLA inserts
the gradient all-reduce over the mesh's ICI.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from bundletrack_tpu.models.vos import VOSNet, propagate_labels, spatial_weight


class VOSTrainBatch(NamedTuple):
    """A batch of short clips with per-frame ground-truth labels.

    clips:  [B, T, H, W, 3] in [0, 1] — frames 0..T-2 are references,
            frame T-1 is the prediction target.
    labels: [B, T, H, W] int32 class ids (0 = background).
    """

    clips: jnp.ndarray
    labels: jnp.ndarray


def _downsample_labels(labels, h, w, num_labels):
    """[.., H, W] int -> [.., h, w, L] one-hot at feature resolution."""
    onehot = jax.nn.one_hot(labels, num_labels)
    out_shape = labels.shape[:-2] + (h, w, num_labels)
    return jax.image.resize(onehot, out_shape, "nearest")


def vos_loss(
    params,
    model: VOSNet,
    batch: VOSTrainBatch,
    w_sigma1: jnp.ndarray,
    w_sigma2: jnp.ndarray,
    num_labels: int = 2,
    temperature: float = 0.05,  # cosine-feature scale; see SegmentationConfig
    dense_num: int = 4,
):
    B, T, H, W, _ = batch.clips.shape
    feats = model.apply({"params": params}, batch.clips.reshape(B * T, H, W, 3))
    h, w = feats.shape[1], feats.shape[2]
    C = feats.shape[-1]
    feats = feats.reshape(B, T, h, w, C)
    labels_lo = _downsample_labels(batch.labels, h, w, num_labels)  # [B,T,h,w,L]

    R = T - 1
    ref_valid = jnp.ones((R,), bool)
    # the reference treats the most recent `dense_num` refs as "dense"
    # (sigma1 prior) and older ones as sparse (sigma2)
    age = R - jnp.arange(R)  # ref t has age R - t relative to the target
    ref_is_recent = age <= dense_num

    def one(feat_refs, label_refs, feat_tgt):
        return propagate_labels(
            feat_refs, label_refs, ref_valid, ref_is_recent, feat_tgt,
            w_sigma1, w_sigma2, temperature,
        )

    pred = jax.vmap(one)(feats[:, :R], labels_lo[:, :R], feats[:, R])  # [B,h,w,L]
    tgt = labels_lo[:, R]
    logp = jnp.log(jnp.clip(pred, 1e-8, 1.0))
    ce = -jnp.sum(tgt * logp, axis=-1)  # [B, h, w]
    # class-balanced weighting: the object covers ~10% of cells, so a plain
    # mean saturates on easy background (measured ce ~1e-4 while hard-world
    # propagation still drifted) — upweight object cells to parity
    is_obj = tgt[..., 1:].sum(-1)  # [B, h, w] foreground mass
    n_obj = jnp.maximum(jnp.sum(is_obj), 1.0)
    n_bg = jnp.maximum(jnp.sum(1.0 - is_obj), 1.0)
    wt = is_obj * (0.5 / n_obj) + (1.0 - is_obj) * (0.5 / n_bg)
    loss = jnp.sum(ce * wt)
    acc = jnp.mean(
        (jnp.argmax(pred, -1) == jnp.argmax(tgt, -1)).astype(jnp.float32)
    )
    # object-cell IoU of the hard prediction: the metric that actually moves
    pred_obj = jnp.argmax(pred, -1) > 0
    tgt_obj = jnp.argmax(tgt, -1) > 0
    inter = jnp.sum(pred_obj & tgt_obj)
    union = jnp.maximum(jnp.sum(pred_obj | tgt_obj), 1)
    return loss, {"ce": jnp.mean(ce), "bal_ce": loss, "acc": acc,
                  "iou": inter / union}


def vos_rollout_loss(
    params,
    model: VOSNet,
    batch: VOSTrainBatch,
    w_sigma1: jnp.ndarray,
    w_sigma2: jnp.ndarray,
    num_labels: int = 2,
    temperature: float = 0.05,
    dense_num: int = 4,
):
    """Sequential rollout loss: references carry the model's OWN predictions.

    vos_loss predicts each target from ground-truth reference labels — that
    task saturates (train IoU 1.0) while long-horizon inference still
    drifts, because inference references are the model's soft predictions.
    Here frame 0 keeps its GT label and frames 1..T-1 are predicted in
    sequence, each becoming a (soft, possibly wrong) reference for the
    next — exactly the inference recurrence — with a class-balanced CE at
    every step.  Gradients flow through the whole rollout, so the model
    learns to emit labels that stay propagable.
    """
    B, T, H, W, _ = batch.clips.shape
    feats = model.apply({"params": params}, batch.clips.reshape(B * T, H, W, 3))
    h, w = feats.shape[1], feats.shape[2]
    C = feats.shape[-1]
    feats = feats.reshape(B, T, h, w, C)
    labels_gt = _downsample_labels(batch.labels, h, w, num_labels)

    R = T - 1

    def one_seq(feat_seq, gt_seq):
        # label buffer: slot t holds the label used when frame t is a ref
        lab0 = gt_seq[0]
        labels_buf = jnp.zeros((T, h, w, num_labels)).at[0].set(lab0)

        def step_t(labels_buf, t):
            age = t - jnp.arange(T)  # age of each buffered frame
            is_ref = age >= 1
            is_recent = is_ref & (age <= dense_num)
            # weights expect exactly R rows; frame T-1 is never a ref of
            # earlier frames, so drop the last slot
            pred = propagate_labels(
                feat_seq[:R], labels_buf[:R], is_ref[:R], is_recent[:R],
                feat_seq[t], w_sigma1, w_sigma2, temperature,
            )
            labels_buf = jax.lax.dynamic_update_index_in_dim(
                labels_buf, pred, t, axis=0
            )
            return labels_buf, pred

        _, preds = jax.lax.scan(step_t, labels_buf, jnp.arange(1, T))
        return preds  # [T-1, h, w, L]

    preds = jax.vmap(one_seq)(feats, labels_gt)  # [B, T-1, h, w, L]
    tgt = labels_gt[:, 1:]
    logp = jnp.log(jnp.clip(preds, 1e-8, 1.0))
    ce = -jnp.sum(tgt * logp, axis=-1)
    is_obj = tgt[..., 1:].sum(-1)
    n_obj = jnp.maximum(jnp.sum(is_obj), 1.0)
    n_bg = jnp.maximum(jnp.sum(1.0 - is_obj), 1.0)
    wt = is_obj * (0.5 / n_obj) + (1.0 - is_obj) * (0.5 / n_bg)
    loss = jnp.sum(ce * wt)
    pred_obj = jnp.argmax(preds, -1) > 0
    tgt_obj = jnp.argmax(tgt, -1) > 0
    inter = jnp.sum(pred_obj & tgt_obj)
    union = jnp.maximum(jnp.sum(pred_obj | tgt_obj), 1)
    # IoU of the LAST rollout step — the drift-sensitive number
    last_p, last_t = pred_obj[:, -1], tgt_obj[:, -1]
    iou_last = jnp.sum(last_p & last_t) / jnp.maximum(
        jnp.sum(last_p | last_t), 1
    )
    return loss, {"ce": jnp.mean(ce), "bal_ce": loss,
                  "iou": inter / union, "iou_last": iou_last}


def make_vos_train_step(
    model: VOSNet,
    tx: optax.GradientTransformation,
    image_hw,
    downscale: int = 8,
    sigma1: float = 8.0,
    sigma2: float = 21.0,
    num_labels: int = 2,
    rollout: bool = False,
):
    """Returns step(params, opt_state, batch) -> (params, opt_state, metrics)."""
    H, W = image_hw
    h, w = H // downscale, W // downscale
    w1 = spatial_weight(h, w, sigma1)
    w2 = spatial_weight(h, w, sigma2)
    loss_fn = vos_rollout_loss if rollout else vos_loss

    def step(params, opt_state, batch: VOSTrainBatch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, model, batch, w1, w2, num_labels
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        return params, opt_state, metrics

    return step
