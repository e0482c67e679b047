"""Model registry.

The reference dispatches on ``--use-equi`` (35/38/39/40) to near-duplicate
model files (``run_unsup_arti_align.py:8-17``, SURVEY.md S14).  Here every
variant is the same ``SlotPoseModel`` parameterised by config:

* use_equi=38 — 2-part revolute (oven / washing machine / laptop / safe)
* use_equi=35 — eyeglasses: nmasks=3, two revolute joints
* use_equi=39 — drawer: joint_type='prismatic', nmasks=4
* use_equi=40 — general multi-part

Stage 0 (global alignment) is its own module, mirroring the two-stage
protocol (``cur_stage`` flag).
"""
from __future__ import annotations

from ..config import Config, ModelConfig
from .alignment import GlobalAlignModel
from .slot_pose import SlotPoseModel

USE_EQUI_TO_PRESET = {35: "eyeglasses", 38: "oven", 39: "drawer", 40: "oven"}


def build_model(cfg: ModelConfig, stage: int = 1, axis_name=None):
    if stage == 0:
        return GlobalAlignModel(cfg=cfg, axis_name=axis_name)
    return SlotPoseModel(cfg=cfg, axis_name=axis_name)
