from bundletrack_tpu.matching.pairwise import (
    descriptor_distances,
    mutual_nearest,
    geometric_gate,
    match_pair,
    match_pairs_batched,
    MatchResult,
)
from bundletrack_tpu.matching.mappoints import (
    MapPointTable,
    init_mappoints,
    update_mappoints,
    propagate_matches,
    forget_frame as forget_frame_mappoints,
)

__all__ = [
    "descriptor_distances",
    "mutual_nearest",
    "geometric_gate",
    "match_pair",
    "match_pairs_batched",
    "MatchResult",
    "MapPointTable",
    "init_mappoints",
    "update_mappoints",
    "propagate_matches",
    "forget_frame_mappoints",
]
