"""Articulated-sample construction — the shared data-engine core.

Reproduces the reference's ``MotionDataset.__getitem__`` pipeline
(``SPConvNets/datasets/MotionDataset.py:298-686``; SURVEY.md §3.4):

  mesh sample -> bbox centralise/scale -> per-part joint angle (random or
  multi-sample grid) -> revolute/prismatic transform + global rotation R1 ->
  per-point & per-part 4x4 GT pose, canonical-state clouds, axis/pivot,
  bbox-centred state/ref translations -> recentre -> FPS to npoints / 4096.

All outputs are channels-last numpy float32 with FIXED shapes (points padded /
FPS'd to exact counts) so the device step is shape-stable.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ..geom import so3 as so3g
from ..geom.transforms import revolute_transform_np
from .mesh import fps_numpy

OORR_NPOINTS = 4096


@dataclasses.dataclass
class JointSpec:
    motion_type: str          # 'rotation' | 'translation' | 'none'
    center: np.ndarray        # [3] pivot point (mesh frame)
    direction: np.ndarray     # [3] axis direction


def sample_joint_angle(
    shape_type: str,
    split: str,
    rng: np.random.RandomState,
    sample_index: int,
    n_samples: int,
    use_multi_sample: bool,
    rot_factor: float,
    seg_id: int = 1,
) -> float:
    """Joint-state sampling rules (ref ``MotionDataset.py:389-420``)."""
    if not use_multi_sample:
        if shape_type in ("laptop",):
            return (rng.uniform(0.0, 1.0) * np.pi - np.pi / 2.0) * rot_factor
        if shape_type == "eyeglasses":
            return -(rng.uniform(0.05, 1.0) * np.pi) * rot_factor
        if shape_type in ("oven", "washing_machine"):
            return (rng.uniform(0.5, 1.0) * np.pi) * rot_factor
        return rng.uniform(0.0, 1.0) * np.pi * rot_factor
    # multi-sample grid over joint states
    if shape_type == "eyeglasses":
        a_idx, b_idx = sample_index // 10, sample_index % 10
        mult = 0.45 if split == "train" else 0.35
        return (0.1 * (a_idx if seg_id == 1 else b_idx) * np.pi) * mult
    if shape_type == "laptop":
        return -((0.5 / n_samples) * sample_index * np.pi - 0.05 * np.pi)
    if shape_type == "washing_machine":
        return (((90.0 / 180.0) / n_samples) * sample_index + 45.0 / 180.0) * np.pi
    if shape_type == "oven":
        return (((80.0 / 180.0) / n_samples) * sample_index + 45.0 / 180.0) * np.pi
    return rng.uniform(0.0, 1.0) * np.pi * rot_factor


def canonical_angle(shape_type: str) -> float:
    """Category canonical joint state (ref ``MotionDataset.py:453-462``)."""
    if shape_type == "laptop":
        return -0.25 * np.pi
    if shape_type == "eyeglasses":
        return 0.10 * np.pi
    if shape_type in ("oven", "washing_machine", "safe"):
        return 0.5 * np.pi
    return 0.5 * np.pi


def sample_global_rotation(
    mode: str, rng: np.random.RandomState, common_R: Optional[np.ndarray] = None
) -> np.ndarray:
    if mode == "none":
        return np.eye(3)
    if mode == "anchor":
        return so3g.ANCHORS[rng.randint(0, 60)].astype(np.float64)
    if mode == "common":
        assert common_R is not None
        return common_R
    # uniform random rotation
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def _bbox_center(pts: np.ndarray) -> np.ndarray:
    return (pts.min(0) + pts.max(0)) / 2.0


def build_sample(
    points: np.ndarray,            # [M, 3] canonical-state surface samples
    point_seg: np.ndarray,         # [M] part ids in [0, P)
    joints: List[JointSpec],       # per part
    *,
    shape_type: str,
    split: str,
    rng: np.random.RandomState,
    npoints: int,
    sample_index: int = 0,
    n_samples: int = 100,
    use_multi_sample: bool = True,
    rot_factor: float = 0.5,
    global_rot_mode: str = "random",
    common_R: Optional[np.ndarray] = None,
    canonical_input: bool = False,  # pre_compute_delta: emit canonical state
    noise_std: float = 0.0,
    mesh=None,                      # (verts, tris, tri_seg) for partial views
    partial_rng: Optional[np.random.RandomState] = None,
    indep_prismatic: bool = False,  # per-part independent translation states
) -> Dict[str, np.ndarray]:
    """Returns the reference sample dict (same keys, channels-last [N, 3]).

    With ``mesh`` + ``partial_rng``, the posed cloud is replaced by a
    mesh-rasterized single-view partial scan (z-buffer over the posed
    triangles, ref MotionDatasetPartial) with the same camera model; the
    canonical/ori clouds stay complete, as in the reference."""
    P = len(joints)

    # bbox centralise + scale (ref :332-337)
    center_pt = _bbox_center(points)
    length_bb = np.linalg.norm(points.max(0) - points.min(0))
    pts = (points - center_pt) / length_bb

    R1 = sample_global_rotation(
        "none" if (canonical_input and split == "train") or global_rot_mode == "none"
        else global_rot_mode,
        rng,
        common_R,
    )

    transformed = np.zeros_like(pts)
    canon_pts = np.zeros_like(pts)
    pose_pts = np.zeros((pts.shape[0], 4, 4), dtype=np.float64)
    pose_segs = np.zeros((P, 4, 4), dtype=np.float64)
    part_state_rots = np.zeros((P, 3, 3))
    part_ref_rots = np.zeros((P, 3, 3))
    part_ref_trans = np.zeros((P, 3))
    part_state_trans_bbox = np.zeros((P, 3))
    part_ref_trans_bbox = np.zeros((P, 3))
    axes, pvs, angles = [], [], []

    rot_seen = False
    for p in range(P):
        j = joints[p]
        sel = point_seg == p
        seg_pts = pts[sel]
        if seg_pts.shape[0] == 0:
            seg_pts = np.zeros((1, 3))
        moving_rot = j.motion_type == "rotation" and (
            not rot_seen or shape_type == "eyeglasses"
        )
        moving_tra = j.motion_type == "translation"
        if moving_rot:
            center = (np.asarray(j.center) - center_pt) / length_bb
            axis = np.asarray(j.direction, dtype=np.float64)
            axis = axis / np.linalg.norm(axis)
            theta = sample_joint_angle(
                shape_type, split, rng, sample_index, n_samples,
                use_multi_sample, rot_factor, seg_id=p,
            )
            angles.append(theta)
            axes.append(axis)
            pvs.append(center)

            rot_pts, M = revolute_transform_np(seg_pts, center, axis, theta)
            # global rotation on top
            rot_pts = rot_pts @ R1.T
            M = np.concatenate([R1 @ M[:3], M[3:4]], axis=0)

            state_bbox = M[:3, 3] - _bbox_center(rot_pts)

            ctheta = canonical_angle(shape_type)
            canon_rot_pts, Mc = revolute_transform_np(seg_pts, center, axis, ctheta)
            ref_bbox = Mc[:3, 3] - _bbox_center(canon_rot_pts)

            if canonical_input and split == "train":
                out_pts = canon_rot_pts
            else:
                out_pts = rot_pts
            part_state_rots[p] = M[:3, :3]
            part_ref_rots[p] = Mc[:3, :3]
            part_ref_trans[p] = Mc[:3, 3]
            part_state_trans_bbox[p] = state_bbox
            part_ref_trans_bbox[p] = ref_bbox
            pose_segs[p] = M
            canon_seg = canon_rot_pts
            rot_seen = True
        elif moving_tra:
            axis = np.asarray(j.direction, dtype=np.float64)
            axis = axis / np.linalg.norm(axis)
            # Default multi-sample grid ties every translating part of a
            # sample to the same distance (the rotation-grid pattern) —
            # which makes drawers mutually inseparable by motion (all share
            # one rigid translation; RESULTS.md r5 finding 9).  The
            # reference repo ships no drawer data recipe (its SAPIEN
            # drawer dataset file is absent), so tied states are this
            # generator's own choice; ``indep_prismatic`` samples each
            # part's opening independently (real multi-drawer scans are
            # independently open), which restores the between-part motion
            # signal the motion-pair teacher needs.
            if not use_multi_sample or indep_prismatic:
                dist = rng.uniform(0.0, 0.25)
            else:
                dist = (0.25 / n_samples) * sample_index
            angles.append(dist)
            axes.append(axis)
            pvs.append((np.asarray(j.center) - center_pt) / length_bb)
            moved = seg_pts + axis * dist
            M = np.eye(4)
            M[:3, 3] = axis * dist
            moved = moved @ R1.T
            M = np.concatenate([R1 @ M[:3], M[3:4]], axis=0)
            out_pts = moved
            part_state_rots[p] = M[:3, :3]
            part_ref_rots[p] = np.eye(3)
            part_state_trans_bbox[p] = M[:3, 3] - _bbox_center(moved)
            part_ref_trans_bbox[p] = -_bbox_center(seg_pts)
            pose_segs[p] = M
            canon_seg = seg_pts
        else:
            out_pts = seg_pts @ R1.T
            M = np.eye(4)
            M = np.concatenate([R1 @ M[:3], M[3:4]], axis=0)
            part_state_rots[p] = M[:3, :3]
            part_ref_rots[p] = np.eye(3)
            part_state_trans_bbox[p] = -_bbox_center(out_pts)
            part_ref_trans_bbox[p] = -_bbox_center(seg_pts)
            pose_segs[p] = M
            canon_seg = seg_pts

        transformed[sel] = out_pts[: sel.sum()]
        canon_pts[sel] = canon_seg[: sel.sum()]
        pose_pts[sel] = pose_segs[p]

    part_axis = np.stack(axes) if axes else np.zeros((1, 3))
    part_pv_point = np.stack(pvs) if pvs else np.zeros((1, 3))
    part_axis = part_axis @ R1.T
    part_pv_point = part_pv_point @ R1.T
    part_angles = np.asarray(angles if angles else [0.0])

    # recentre by transformed centroid (ref :578-597 uses mean)
    af_center = transformed.mean(0)
    transformed = transformed - af_center
    pose_pts[:, :3, 3] -= af_center
    pose_segs[:, :3, 3] -= af_center
    part_pv_point = part_pv_point - af_center
    pv_offset_vec = part_pv_point - (
        np.sum(part_pv_point * part_axis, axis=-1, keepdims=True) * part_axis
    )
    part_pv_offset = np.linalg.norm(pv_offset_vec, axis=-1)

    if noise_std > 0:
        transformed = transformed + rng.normal(0.0, noise_std, transformed.shape)

    # per-point seg of the FULL (canonical-order) cloud — the partial branch
    # below replaces point_seg with the visible subset's labels, but the
    # canonical cloud keeps the full ordering
    canon_point_seg = point_seg

    # --- optional mesh-rasterized single-view partial scan ---------------
    if mesh is not None and partial_rng is not None:
        from .rasterize import rasterize_depth_points

        verts, tris, tri_seg = mesh
        vnorm = (np.asarray(verts, dtype=np.float64) - center_pt) / length_bb
        tri_v = vnorm[np.asarray(tris)]                    # [T, 3, 3] canonical
        Mseg = pose_segs[np.asarray(tri_seg)]              # [T, 4, 4] posed
        tri_world = (
            np.einsum("tij,tkj->tki", Mseg[:, :3, :3], tri_v)
            + Mseg[:, None, :3, 3]
        )
        vis_pts, vis_lbl = rasterize_depth_points(
            tri_world, np.asarray(tri_seg), partial_rng
        )
        if vis_pts.shape[0] >= 32:  # keep the complete cloud on degenerate views
            transformed = vis_pts
            point_seg = vis_lbl.astype(point_seg.dtype)
            pose_pts = pose_segs[point_seg]

    # FPS to fixed sizes.  canon/ori clouds may have a different point count
    # than the (possibly partial) posed cloud -> independent FPS indices.
    fps_idx = fps_numpy(transformed, npoints)
    if len(fps_idx) < npoints:
        fps_idx = np.resize(fps_idx, npoints)
    if canon_pts.shape[0] == transformed.shape[0]:
        canon_fps = fps_idx
    else:
        canon_fps = fps_numpy(canon_pts, npoints)
        if len(canon_fps) < npoints:
            canon_fps = np.resize(canon_fps, npoints)
    oorr_n = min(OORR_NPOINTS, transformed.shape[0])
    fps_oorr = fps_numpy(transformed, oorr_n)
    # pad oorr to OORR_NPOINTS by repetition for fixed shapes
    if oorr_n < OORR_NPOINTS:
        reps = int(np.ceil(OORR_NPOINTS / oorr_n))
        fps_oorr = np.tile(fps_oorr, reps)[:OORR_NPOINTS]
    if canon_pts.shape[0] == transformed.shape[0]:
        canon_oorr = fps_oorr
    else:
        co_n = min(OORR_NPOINTS, canon_pts.shape[0])
        canon_oorr = fps_numpy(canon_pts, co_n)
        if co_n < OORR_NPOINTS:
            canon_oorr = np.tile(
                canon_oorr, int(np.ceil(OORR_NPOINTS / co_n))
            )[:OORR_NPOINTS]

    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    return {
        "pc": f32(transformed[fps_idx]),
        "ori_pc": f32(pts[canon_fps]),
        "canon_pc": f32(canon_pts[canon_fps]),
        "oorr_pc": f32(transformed[fps_oorr]),
        "oorr_canon_pc": f32(canon_pts[canon_oorr]),
        "label": point_seg[fps_idx].astype(np.int32),
        # seg labels aligned with canon_pc's own FPS indices (equals `label`
        # for complete clouds; differs for partial views where the posed and
        # canonical clouds have independent orderings)
        "canon_label": canon_point_seg[canon_fps].astype(np.int32),
        "oorr_label": point_seg[fps_oorr].astype(np.int32),
        "pose": f32(pose_pts[fps_idx]),
        "pose_segs": f32(pose_segs),
        "part_state_rots": f32(part_state_rots),
        "part_ref_rots": f32(part_ref_rots),
        "part_ref_trans": f32(part_ref_trans),
        "part_state_trans_bbox": f32(part_state_trans_bbox),
        "part_ref_trans_bbox": f32(part_ref_trans_bbox),
        "part_axis": f32(part_axis),
        "part_pv_offset": f32(part_pv_offset),
        "part_pv_point": f32(part_pv_point),
        "part_angles": f32(part_angles),
    }
