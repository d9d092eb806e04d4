from bundletrack_tpu.ransac.ransac import ransac_pair, ransac_multi_pair, RansacResult

__all__ = ["ransac_pair", "ransac_multi_pair", "RansacResult"]
