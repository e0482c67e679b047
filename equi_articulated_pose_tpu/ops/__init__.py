from .sampling import (
    ball_query,
    furthest_point_sampling,
    gather_points,
    group_points,
    pairwise_sqdist,
)
from .chamfer import chamfer_chunked, chamfer_l1, chamfer_sq, chamfer_sq_with_idx
