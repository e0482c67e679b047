"""Mesh IO + sampling for the data engine (CPU, numpy, vectorised).

Replaces ``SPConvNets/datasets/data_utils.py``: OBJ loading (:153), seg-index
loading (:173), motion-attribute JSON (:127), and area-weighted triangle
sampling (:22-89) — the reference's per-triangle Python loop becomes one
vectorised pass (same semantics: ~500 samples per unit area, min 1 per
triangle, sqrt-barycentric uniform sampling).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ loader: returns (vertices [V, 3] f64, triangles [T, 3] i64).

    Faces with more than 3 vertices are fan-triangulated.
    """
    verts: List[List[float]] = []
    faces: List[List[int]] = []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, dtype=np.float64), np.asarray(faces, dtype=np.int64)


def load_triangles_to_seg_idx(path: str, nparts: int | None = None):
    """Per-triangle part index, remapped to contiguous [0, P).

    Accepts both on-disk formats: the reference's pickled dict
    {triangle_idx: seg_idx} (``data_utils.py:173-183`` iterates keys
    min..max) and a plain integer array.
    """
    raw = np.load(path, allow_pickle=True)
    if raw.dtype == object:  # reference format: np.save of a python dict
        mapping = raw.item()
        keys = sorted(int(k) for k in mapping.keys())
        lo, hi = keys[0], keys[-1]
        arr = np.array(
            [int(mapping[k]) for k in range(lo, hi + 1)], dtype=np.int64
        )
    else:
        arr = raw.astype(np.int64)
    uniq = np.unique(arr)
    remap = {int(v): i for i, v in enumerate(uniq.tolist())}
    out = np.vectorize(remap.__getitem__)(arr)
    if nparts is not None:
        out = np.minimum(out, nparts - 1)
    return out


def load_motion_attributes(path: str) -> List[Dict]:
    """motion_attributes.json -> list of per-part dicts with keys
    ``motion_type`` ('rotation' | 'translation' | 'none'), ``center`` [3],
    ``direction`` [3].

    The reference format is a part HIERARCHY (dof_name/motion_type/center/
    direction + ``children``) traversed depth-first
    (``data_utils.py:127-151``); flat lists are accepted too.
    """
    with open(path, "r") as f:
        data = json.load(f)
    if isinstance(data, list):
        return data

    if "dof_name" in data or "motion_type" in data:
        out: List[Dict] = []

        def walk(node):
            out.append(
                {
                    "dof_name": node.get("dof_name", ""),
                    "motion_type": node.get("motion_type", "none"),
                    "center": node.get("center", [0.0, 0.0, 0.0]),
                    "direction": node.get("direction", [0.0, 1.0, 0.0]),
                }
            )
            for child in node.get("children", []):
                walk(child)

        walk(data)
        return out

    # flat dict keyed by part id
    keys = sorted(data.keys())
    return [data[k] for k in keys]


def triangle_areas(vertices: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    a = vertices[triangles[:, 0]]
    b = vertices[triangles[:, 1]]
    c = vertices[triangles[:, 2]]
    return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)


def sample_points_on_mesh(
    vertices: np.ndarray,
    triangles: np.ndarray,
    tri_seg: np.ndarray,
    rng: np.random.RandomState,
    density: float = 500.0,
    min_per_tri: int = 1,
):
    """Area-proportional surface sampling (vectorised).

    Returns (points [M, 3], point_seg [M]).  Count per triangle is
    ``max(min_per_tri, int(area * density))`` — the reference's rule
    (``data_utils.py:57-59``).
    """
    areas = triangle_areas(vertices, triangles)
    counts = np.maximum(min_per_tri, (areas * density).astype(np.int64))
    tri_idx = np.repeat(np.arange(len(triangles)), counts)
    m = tri_idx.shape[0]
    u = rng.uniform(0.0, 1.0, m)
    v = rng.uniform(0.0, 1.0, m)
    su = np.sqrt(u)
    w0 = 1.0 - su
    w1 = su * (1.0 - v)
    w2 = su * v
    tri = triangles[tri_idx]
    pts = (
        vertices[tri[:, 0]] * w0[:, None]
        + vertices[tri[:, 1]] * w1[:, None]
        + vertices[tri[:, 2]] * w2[:, None]
    )
    return pts, tri_seg[tri_idx]


def _fps_numpy_impl(points: np.ndarray, m: int, start: int = 0) -> np.ndarray:
    n = points.shape[0]
    idx = np.zeros(m, dtype=np.int64)
    idx[0] = start
    dist = np.full(n, np.inf)
    cur = start
    pts = points.astype(np.float32)
    for i in range(1, m):
        d = np.sum((pts - pts[cur]) ** 2, axis=-1)
        dist = np.minimum(dist, d)
        cur = int(np.argmax(dist))
        idx[i] = cur
    return idx


def fps_numpy(points: np.ndarray, m: int, start: int = 0) -> np.ndarray:
    """Greedy farthest point sampling (deterministic, start index 0).

    Dispatches to the native C++ kernel (native/pointops.cpp) when available
    — the data-engine hot path — with a numpy fallback."""
    n = points.shape[0]
    if m >= n:
        return np.arange(n, dtype=np.int64)
    from ..native import pointops

    if pointops.have_native():
        return pointops.fps(points, m, start)
    return _fps_numpy_impl(points, m, start)


def estimate_normals(points: np.ndarray, k: int = 16) -> np.ndarray:
    """Local-PCA normal estimation (ref ``data_utils.py:198``)."""
    n = points.shape[0]
    d2 = ((points[:, None] - points[None]) ** 2).sum(-1)
    nbr = np.argsort(d2, axis=-1)[:, :k]
    nbrs = points[nbr]  # [N, k, 3]
    centered = nbrs - nbrs.mean(1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered)
    _, vecs = np.linalg.eigh(cov)
    return vecs[:, :, 0]
