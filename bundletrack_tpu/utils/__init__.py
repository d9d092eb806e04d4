from bundletrack_tpu.utils.timing import StageTimer
from bundletrack_tpu.utils.checkpoint import save_tracker_state, restore_tracker_state

__all__ = ["StageTimer", "save_tracker_state", "restore_tracker_state"]
