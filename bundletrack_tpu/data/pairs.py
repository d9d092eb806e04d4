"""Training-pair construction: ground-truth warp fields from depth + pose.

The reference trains LF-Net on image pairs whose pixel-level correspondence
is derived from depth maps and relative camera pose (reference:
lf-net-release/train_lfnet.py builds se3/flow pairs the same way), and
trains VOS on clips with per-frame labels (transductive-vos.pytorch/main.py).
This module builds both batch types from any RGB-D sequence with known
ob_in_cam poses — in this environment, data/synthetic.py sequences.

Host-side numpy (data pipeline, not on the hot path).
"""

from __future__ import annotations

import numpy as np


def warp_field_from_depth(
    depth1: np.ndarray,
    K: np.ndarray,
    ob_in_cam1: np.ndarray,
    ob_in_cam2: np.ndarray,
    depth2: np.ndarray | None = None,
    mask1: np.ndarray | None = None,
    occlusion_tol: float = 0.02,
):
    """Per-pixel correspondence field frame1 -> frame2.

    For each pixel of frame 1 with valid depth: unproject with K, move the
    point from camera-1 to camera-2 through the object poses
    (p2 = ob_in_cam2 @ ob_in_cam1^-1 @ p1 — the object is rigid, the camera
    moves), and project into frame 2.  Validity requires: valid source depth,
    the target landing inside the image, and (when depth2 is given) the
    projected depth agreeing with frame 2's depth within `occlusion_tol`
    meters (occlusion check).

    Returns (warp12 [H, W, 2] float32 xy, valid [H, W] bool).
    """
    H, W = depth1.shape
    u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    z = depth1.astype(np.float32)
    valid = z > 0
    if mask1 is not None:
        valid &= mask1.astype(bool)

    x = (u - K[0, 2]) / K[0, 0] * z
    y = (v - K[1, 2]) / K[1, 1] * z
    p1 = np.stack([x, y, z], axis=-1)  # [H, W, 3] in cam-1

    T21 = ob_in_cam2 @ np.linalg.inv(ob_in_cam1)
    p2 = p1 @ T21[:3, :3].T + T21[:3, 3]
    z2 = p2[..., 2]
    valid &= z2 > 1e-6
    z2s = np.where(z2 > 1e-6, z2, 1.0)
    u2 = p2[..., 0] / z2s * K[0, 0] + K[0, 2]
    v2 = p2[..., 1] / z2s * K[1, 1] + K[1, 2]
    inside = (u2 >= 0) & (u2 <= W - 1) & (v2 >= 0) & (v2 <= H - 1)
    valid &= inside

    if depth2 is not None:
        ui = np.clip(np.round(u2).astype(np.int32), 0, W - 1)
        vi = np.clip(np.round(v2).astype(np.int32), 0, H - 1)
        d2 = depth2[vi, ui]
        valid &= (d2 > 0) & (np.abs(d2 - z2) < occlusion_tol)

    warp = np.stack([u2, v2], axis=-1).astype(np.float32)
    warp = np.where(valid[..., None], warp, 0.0)
    return warp, valid


def lfnet_pair_batch(seq, frame_pairs):
    """Build LFNetTrainBatch arrays from a SyntheticSequence.

    frame_pairs: list of (i, j) index pairs; each contributes one batch row
    (img1=frame i, img2=frame j, warp from depth_i + relative pose).
    Returns dict of numpy arrays matching models.LFNetTrainBatch fields.
    """
    img1, img2, warps, valids = [], [], [], []
    for i, j in frame_pairs:
        w, val = warp_field_from_depth(
            seq.depth[i], seq.K, seq.ob_in_cam[i], seq.ob_in_cam[j],
            depth2=seq.depth[j], mask1=seq.mask[i],
        )
        img1.append(seq.gray[i][..., None])
        img2.append(seq.gray[j][..., None])
        warps.append(w)
        valids.append(val)
    return {
        "img1": np.stack(img1).astype(np.float32),
        "img2": np.stack(img2).astype(np.float32),
        "warp12": np.stack(warps),
        "warp_valid": np.stack(valids),
    }


def vos_clip_batch(seq, clip_starts, clip_len: int):
    """Build VOSTrainBatch arrays (clips + 0/1 labels from the object mask)."""
    clips, labels = [], []
    for s in clip_starts:
        g = seq.gray[s : s + clip_len]
        clips.append(np.repeat(g[..., None], 3, axis=-1))
        labels.append(seq.mask[s : s + clip_len].astype(np.int32))
    return {
        "clips": np.stack(clips).astype(np.float32),
        "labels": np.stack(labels),
    }
