"""Software depth rasterizer for partial-view generation.

Replaces the reference's pyrender depth-only rendering
(``MotionDatasetPartial.py:170-499``: per-part mesh depth buffers at 640x480,
yfov 60deg, camera ~ N([0,0,-1.8], [0.2,0.2,0.15]), back-projection of buffer
depth to a labelled partial cloud) with a dependency-free numpy z-buffer over
the posed triangles.  Occlusion is mesh-accurate: each pixel keeps the
nearest triangle, and the partial cloud is the back-projection of the filled
pixels with the winning triangle's part label.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

CAM_MEAN = np.array([0.0, 0.0, -1.8])
CAM_STD = np.array([0.2, 0.2, 0.15])
YFOV = np.deg2rad(60.0)


def look_at(eye: np.ndarray, target=np.zeros(3), up=np.array([0.0, 1.0, 0.0])):
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    if np.linalg.norm(r) < 1e-6:
        r = np.array([1.0, 0.0, 0.0])
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    R = np.stack([r, u, -f], axis=0)  # world -> camera (OpenGL convention)
    t = -R @ eye
    return R, t


def sample_camera(rng: np.random.RandomState, upper_hemi: bool = True):
    eye = CAM_MEAN + rng.randn(3) * CAM_STD
    if upper_hemi:
        eye[1] = abs(eye[1])
    return look_at(eye)


def depth_buffer(
    tri_world: np.ndarray,   # [T, 3, 3] posed triangles (world frame)
    R: np.ndarray,
    t: np.ndarray,
    pw: int = 320,
    ph: int = 240,
    yfov: float = YFOV,
) -> Tuple[np.ndarray, np.ndarray]:
    """Z-buffer the triangles under a fixed camera.  Returns
    (depth [ph, pw], winning triangle id [ph, pw], -1 where empty)."""
    cam = tri_world @ R.T + t                      # [T, 3, 3]
    z = -cam[..., 2]                               # view depth per vertex
    focal = 1.0 / np.tan(yfov / 2.0)
    aspect = pw / ph
    zc = np.maximum(z, 1e-6)
    sx = (cam[..., 0] / zc * focal / aspect * 0.5 + 0.5) * pw   # [T, 3]
    sy = (cam[..., 1] / zc * focal * 0.5 + 0.5) * ph

    depth = np.full((ph, pw), np.inf, dtype=np.float64)
    tri_id = np.full((ph, pw), -1, dtype=np.int64)

    order = np.argsort(np.min(z, axis=-1))  # near-to-far: cheap early-out
    for ti in order:
        if np.any(z[ti] <= 1e-4):
            continue  # behind the camera
        xs, ys = sx[ti], sy[ti]
        x0 = max(int(np.floor(xs.min())), 0)
        x1 = min(int(np.ceil(xs.max())) + 1, pw)
        y0 = max(int(np.floor(ys.min())), 0)
        y1 = min(int(np.ceil(ys.max())) + 1, ph)
        if x0 >= x1 or y0 >= y1:
            continue
        gx, gy = np.meshgrid(
            np.arange(x0, x1) + 0.5, np.arange(y0, y1) + 0.5
        )
        # barycentric via edge functions (screen space)
        xa, ya = xs[0], ys[0]
        xb, yb = xs[1], ys[1]
        xc, yc = xs[2], ys[2]
        den = (yb - yc) * (xa - xc) + (xc - xb) * (ya - yc)
        if abs(den) < 1e-12:
            continue
        w0 = ((yb - yc) * (gx - xc) + (xc - xb) * (gy - yc)) / den
        w1 = ((yc - ya) * (gx - xc) + (xa - xc) * (gy - yc)) / den
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        # perspective-correct depth: interpolate 1/z
        inv_z = w0 / z[ti, 0] + w1 / z[ti, 1] + w2 / z[ti, 2]
        zi = 1.0 / np.maximum(inv_z, 1e-9)
        sub_d = depth[y0:y1, x0:x1]
        sub_t = tri_id[y0:y1, x0:x1]
        win = inside & (zi < sub_d)
        sub_d[win] = zi[win]
        sub_t[win] = ti
    return depth, tri_id


def rasterize_depth_points(
    tri_world: np.ndarray,   # [T, 3, 3] posed triangles (world frame)
    tri_label: np.ndarray,   # [T] part id per triangle
    rng: np.random.RandomState,
    pw: int = 320,
    ph: int = 240,
    yfov: float = YFOV,
    upper_hemi: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Rasterize posed triangles under a random camera; back-project the
    depth buffer.  Returns (points [K, 3] world frame, labels [K])."""
    R, t = sample_camera(rng, upper_hemi)
    depth, tri_id = depth_buffer(tri_world, R, t, pw, ph, yfov)
    focal = 1.0 / np.tan(yfov / 2.0)
    aspect = pw / ph

    filled = tri_id >= 0
    if not filled.any():
        return np.zeros((0, 3)), np.zeros((0,), dtype=np.int64)
    ys, xs = np.nonzero(filled)
    zi = depth[ys, xs]
    # back-project pixel centres (ref buffer_depth->NDC->points, :161-168)
    x_ndc = (xs + 0.5) / pw * 2.0 - 1.0
    y_ndc = (ys + 0.5) / ph * 2.0 - 1.0
    x_cam = x_ndc * zi * aspect / focal
    y_cam = y_ndc * zi / focal
    cam_pts = np.stack([x_cam, y_cam, -zi], axis=-1)
    world = (cam_pts - t) @ R
    labels = tri_label[tri_id[ys, xs]]
    return world, labels
