"""Single-file npz (de)serialization for Flax param trees.

Small committable artifacts (fp16 floats, ~2x smaller than orbax dirs) play
the role of the reference's released checkpoints (TF1 for LF-Net, torch .pth
for VOS — lf-net-release/run_server.py:120-134, run_video.py:167-181).
"""

from __future__ import annotations

import numpy as np


def save_params_npz(path: str, params) -> None:
    """Serialize a param tree to one compressed npz (floats stored fp16)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        a = np.asarray(v)
        out[k] = a.astype(np.float16) if a.dtype == np.float32 else a
    np.savez_compressed(path, **out)


def load_params_npz(path: str, like):
    """Load a tree saved by save_params_npz; `like` provides structure/shapes.

    Shapes are validated; floats are restored as f32.
    """
    import flax

    flat_like = flax.traverse_util.flatten_dict(like, sep="/")
    data = np.load(path)
    flat = {}
    for k, ref in flat_like.items():
        if k not in data:
            raise KeyError(f"checkpoint {path} missing param {k}")
        a = np.asarray(data[k])
        if np.issubdtype(a.dtype, np.floating):
            a = a.astype(np.float32)
        if a.shape != np.shape(ref):
            raise ValueError(
                f"param {k}: checkpoint shape {a.shape} != model {np.shape(ref)}"
            )
        flat[k] = a
    extra = set(data.files) - set(flat_like)
    if extra:
        raise ValueError(f"checkpoint {path} has unknown params: {sorted(extra)}")
    return flax.traverse_util.unflatten_dict(flat, sep="/")
