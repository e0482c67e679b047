"""Partial (single-view depth) dataset variants.

The reference renders each part's mesh with pyrender depth-only and
back-projects the buffer (``MotionDatasetPartial.py:170-499``; camera mean
[0, 0, -1.8], std [0.2, 0.2, 0.15], yfov 60deg, 640x480, upper hemisphere).
Here visibility is computed by a point-based z-buffer over the (dense)
sampled surface cloud — same camera model, no pyrender/OpenGL dependency, and
vectorised numpy throughout.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .articulated import OORR_NPOINTS
from .mesh import fps_numpy
from .synthetic import SyntheticDataset
from .shape2motion import MotionDataset

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


def zbuffer_visible(
    points: np.ndarray,
    rng: np.random.RandomState,
    pw: int = 160,
    ph: int = 120,
    yfov: float = YFOV,
    upper_hemi: bool = True,
) -> np.ndarray:
    """Boolean visibility per point under a random single-view camera.

    Point-based z-buffer: project all points, keep the nearest per pixel (and
    anything within a small depth tolerance of it).
    """
    eye = CAM_MEAN + rng.randn(3) * CAM_STD
    if upper_hemi:
        eye[1] = abs(eye[1])
    R, t = look_at(eye)
    cam = points @ R.T + t
    z = -cam[:, 2]  # depth along view dir
    valid = z > 1e-4
    focal = 1.0 / np.tan(yfov / 2.0)
    aspect = pw / ph
    x_ndc = (cam[:, 0] / np.maximum(z, 1e-6)) * focal / aspect
    y_ndc = (cam[:, 1] / np.maximum(z, 1e-6)) * focal
    px = ((x_ndc * 0.5 + 0.5) * pw).astype(np.int64)
    py = ((y_ndc * 0.5 + 0.5) * ph).astype(np.int64)
    inside = valid & (px >= 0) & (px < pw) & (py >= 0) & (py < ph)
    depth = np.full(pw * ph, np.inf)
    # splat each point over a 3x3 pixel footprint so sparse clouds still
    # occlude (a point-based stand-in for triangle rasterisation)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            qx = np.clip(px + dx, 0, pw - 1)
            qy = np.clip(py + dy, 0, ph - 1)
            pix = qy * pw + qx
            np.minimum.at(depth, pix[inside], z[inside])
    pix = np.clip(py, 0, ph - 1) * pw + np.clip(px, 0, pw - 1)
    tol = 0.01 + 0.01 * depth[pix]
    vis = inside & (z <= depth[pix] + tol)
    return vis


def make_partial(sample: Dict[str, np.ndarray], rng: np.random.RandomState,
                 npoints: int) -> Dict[str, np.ndarray]:
    """Convert a complete sample (using its dense ``oorr`` cloud) into a
    single-view partial sample with the same contract."""
    dense = sample["oorr_pc"]
    dense_label = sample["oorr_label"]
    vis = zbuffer_visible(dense, rng)
    if vis.sum() < 32:  # degenerate view: keep everything
        vis = np.ones(len(dense), dtype=bool)
    pts = dense[vis]
    lbl = dense_label[vis]
    # per-point pose from per-part poses
    pose_segs = sample["pose_segs"]
    pose = pose_segs[lbl]
    fps_idx = fps_numpy(pts, npoints)
    if len(fps_idx) < npoints:
        fps_idx = np.tile(fps_idx, int(np.ceil(npoints / len(fps_idx))))[:npoints]
    out = dict(sample)
    out["pc"] = np.ascontiguousarray(pts[fps_idx], dtype=np.float32)
    out["label"] = lbl[fps_idx].astype(np.int32)
    out["pose"] = np.ascontiguousarray(pose[fps_idx], dtype=np.float32)
    # partial oorr cloud (padded to fixed size)
    oorr_idx = np.arange(len(pts))
    if len(oorr_idx) < OORR_NPOINTS:
        oorr_idx = np.tile(oorr_idx, int(np.ceil(OORR_NPOINTS / len(oorr_idx))))
    oorr_idx = oorr_idx[:OORR_NPOINTS]
    out["oorr_pc"] = np.ascontiguousarray(pts[oorr_idx], dtype=np.float32)
    out["oorr_label"] = lbl[oorr_idx].astype(np.int32)
    return out


class _PartialMixin:
    """Point-splat fallback for datasets WITHOUT a triangle mesh (HOI4D
    down-sampled scans).  Mesh-backed datasets use the z-buffer triangle
    rasterizer instead (``rasterize.py``, via partial_view=True)."""

    # fixed integer salt: str-hash seeding is randomized per process
    # (PYTHONHASHSEED) and would make the view non-reproducible across runs
    _VIEW_SALT = 0x9E3779B1

    def __getitem__(self, index):
        sample = super().__getitem__(index)  # type: ignore[misc]
        rng = np.random.RandomState((index * 2654435761 + self._VIEW_SALT) % (2**31))
        return make_partial(sample, rng, self.npoints)


class PartialSyntheticDataset(SyntheticDataset):
    """Single-view partial synthetic shapes — mesh-rasterized occlusion."""

    def __init__(self, *a, **kw):
        kw.setdefault("partial_view", True)
        super().__init__(*a, **kw)


class PartialMotionDataset(MotionDataset):
    """Single-view partial Shape2Motion (MotionDatasetPartial analog) —
    z-buffer depth rasterization of the posed part meshes."""

    def __init__(self, *a, **kw):
        kw.setdefault("partial_view", True)
        super().__init__(*a, **kw)
