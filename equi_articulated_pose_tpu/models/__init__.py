from .alignment import GlobalAlignModel
from .slot_pose import SlotPoseModel
from .registry import build_model


__all__ = ["GlobalAlignModel", "SlotPoseModel", "build_model"]
