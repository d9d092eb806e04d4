from bundletrack_tpu.tracker.state import TrackerState, init_tracker_state, FrameObservation
from bundletrack_tpu.tracker.bundler import track_frame, make_track_frame
from bundletrack_tpu.tracker.selection import select_ba_subset, keyframe_admission

__all__ = [
    "TrackerState",
    "init_tracker_state",
    "FrameObservation",
    "track_frame",
    "make_track_frame",
    "select_ba_subset",
    "keyframe_admission",
]
