from bundletrack_tpu.pallas_kernels.matching import fused_mutual_match

__all__ = ["fused_mutual_match"]
