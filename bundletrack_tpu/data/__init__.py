from bundletrack_tpu.data.synthetic import render_synthetic_sequence, SyntheticSequence
from bundletrack_tpu.data.hard_world import (
    HardSequence,
    hard_passes,
    model_points,
    render_hard_sequence,
)

__all__ = [
    "render_synthetic_sequence",
    "SyntheticSequence",
    "HardSequence",
    "hard_passes",
    "model_points",
    "render_hard_sequence",
]
