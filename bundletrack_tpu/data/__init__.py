from bundletrack_tpu.data.synthetic import render_synthetic_sequence, SyntheticSequence

__all__ = ["render_synthetic_sequence", "SyntheticSequence"]
