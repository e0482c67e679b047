from .so3 import (
    ANCHORS,
    IDENTITY_IDX,
    NUM_ANCHORS,
    TRACE_IDX,
    axis_angle_to_matrix,
    get_anchors,
    get_c4_y_anchors,
    get_trace_idx,
    left_perm_table,
    matrix_to_axis_angle,
    nearest_anchor_idx,
    ortho6d_to_matrix,
    quat_to_matrix,
    random_rotation,
    rotation_angle,
    so3_mean,
)
from .kernels import KERNEL_CONDENSE_RATIO, spherical_kernel_points
from .transforms import (
    apply_inverse_rt,
    apply_rt,
    compose_rt_np,
    inverse_rt_np,
    prismatic_matrix_np,
    revolute_matrix_np,
    revolute_transform_np,
)
