from .metrics import (
    axis_angle_error_deg,
    iou_matrix,
    matched_seg_iou,
    relative_rotation_errors,
    rot_diff_degree,
    rot_diff_rad,
    translation_error,
)
from .pose_fit import procrustes
from .ransac import ransac_fit_r, ransac_fit_t
from .evaluator import Evaluator, run_eval
