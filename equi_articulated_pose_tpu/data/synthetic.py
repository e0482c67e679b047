"""Procedural articulated-object generator.

Generates category-plausible articulated meshes (box assemblies with revolute
or prismatic joints) matching each Shape2Motion category's topology, so the
full train/eval stack runs without the (externally distributed) Shape2Motion
data.  Serves as test fixture and benchmark workload; the real-data loader
(`shape2motion.py`) shares the same ``build_sample`` pipeline.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .articulated import JointSpec, build_sample
from .mesh import sample_points_on_mesh

_BOX_FACES = np.array(
    [
        [0, 1, 2], [0, 2, 3],
        [4, 6, 5], [4, 7, 6],
        [0, 4, 5], [0, 5, 1],
        [3, 2, 6], [3, 6, 7],
        [0, 3, 7], [0, 7, 4],
        [1, 5, 6], [1, 6, 2],
    ],
    dtype=np.int64,
)


def _box(center, size) -> Tuple[np.ndarray, np.ndarray]:
    cx, cy, cz = center
    sx, sy, sz = np.asarray(size) / 2.0
    verts = np.array(
        [
            [cx - sx, cy - sy, cz - sz],
            [cx + sx, cy - sy, cz - sz],
            [cx + sx, cy + sy, cz - sz],
            [cx - sx, cy + sy, cz - sz],
            [cx - sx, cy - sy, cz + sz],
            [cx + sx, cy - sy, cz + sz],
            [cx + sx, cy + sy, cz + sz],
            [cx - sx, cy + sy, cz + sz],
        ]
    )
    return verts, _BOX_FACES.copy()


def _assemble(parts):
    """parts: list of (verts, faces) -> (verts, faces, tri_seg)."""
    vs, fs, seg = [], [], []
    off = 0
    for i, (v, f) in enumerate(parts):
        vs.append(v)
        fs.append(f + off)
        seg.append(np.full(len(f), i, dtype=np.int64))
        off += len(v)
    return np.concatenate(vs), np.concatenate(fs), np.concatenate(seg)


def make_shape(shape_type: str, rng: np.random.RandomState):
    """-> (vertices, triangles, tri_seg, joints) in the canonical state."""
    if shape_type in ("oven", "washing_machine", "safe", "dishwasher"):
        # body box + front door hinged at the bottom (oven) / side (safe)
        w = rng.uniform(0.8, 1.2)
        h = rng.uniform(0.8, 1.4)
        d = rng.uniform(0.7, 1.1)
        t = rng.uniform(0.04, 0.08)
        body = _box([0, 0, -d / 2], [w, h, d])
        door = _box([0, 0, t / 2], [w * 0.9, h * 0.9, t])
        if shape_type == "safe":
            pivot = np.array([-w * 0.45, 0.0, 0.0])
            axis = np.array([0.0, 1.0, 0.0])
        else:
            pivot = np.array([0.0, -h * 0.45, 0.0])
            axis = np.array([1.0, 0.0, 0.0])
        joints = [
            JointSpec("none", np.zeros(3), np.array([0.0, 1.0, 0.0])),
            JointSpec("rotation", pivot, axis),
        ]
        v, f, s = _assemble([body, door])
        return v, f, s, joints

    if shape_type == "laptop":
        w = rng.uniform(0.9, 1.3)
        d = rng.uniform(0.7, 1.0)
        t = rng.uniform(0.03, 0.06)
        base = _box([0, t / 2, d / 2], [w, t, d])
        screen = _box([0, d / 2, -t / 2], [w, d, t])
        joints = [
            JointSpec("none", np.zeros(3), np.array([0.0, 1.0, 0.0])),
            JointSpec("rotation", np.array([0.0, 0.0, 0.0]), np.array([1.0, 0.0, 0.0])),
        ]
        v, f, s = _assemble([base, screen])
        return v, f, s, joints

    if shape_type == "eyeglasses":
        w = rng.uniform(1.0, 1.4)
        t = rng.uniform(0.03, 0.06)
        leg = rng.uniform(0.8, 1.2)
        frame = _box([0, 0, 0], [w, 0.3, t])
        left = _box([-w / 2 + t / 2, 0, -leg / 2], [t, 0.25, leg])
        right = _box([w / 2 - t / 2, 0, -leg / 2], [t, 0.25, leg])
        joints = [
            JointSpec("none", np.zeros(3), np.array([0.0, 1.0, 0.0])),
            JointSpec("rotation", np.array([-w / 2 + t / 2, 0.0, 0.0]), np.array([0.0, 1.0, 0.0])),
            JointSpec("rotation", np.array([w / 2 - t / 2, 0.0, 0.0]), np.array([0.0, -1.0, 0.0])),
        ]
        v, f, s = _assemble([frame, left, right])
        return v, f, s, joints

    if shape_type == "drawer":
        w = rng.uniform(0.9, 1.2)
        h = rng.uniform(1.2, 1.6)
        d = rng.uniform(0.7, 1.0)
        cab = _box([0, 0, -d / 2], [w, h, d])
        rows = [h / 3, 0.0, -h / 3]
        drawers = [
            _box([0, y, -d / 2 + 0.02], [w * 0.85, h / 3 * 0.8, d * 0.9])
            for y in rows
        ]
        joints = [JointSpec("none", np.zeros(3), np.array([0.0, 1.0, 0.0]))] + [
            JointSpec("translation", np.array([0.0, y, 0.0]), np.array([0.0, 0.0, 1.0]))
            for y in rows
        ]
        v, f, s = _assemble([cab] + drawers)
        return v, f, s, joints

    raise ValueError(f"unknown synthetic shape type {shape_type}")


class SyntheticDataset:
    """Drop-in articulated dataset with the MotionDataset sample contract."""

    def __init__(
        self,
        shape_type: str = "oven",
        split: str = "train",
        npoints: int = 512,
        n_shapes: int = 16,
        n_samples: int = 20,
        use_multi_sample: bool = True,
        global_rot_mode: str = "random",
        rot_factor: float = 0.5,
        canonical_input: bool = False,
        seed: int = 0,
        density: float = 2000.0,
        cache_base: bool = True,
        partial_view: bool = False,
        cache_samples: bool = True,
        cache_limit: int = 4096,
        indep_prismatic: bool = False,
    ):
        self.shape_type = shape_type
        self.split = split
        self.npoints = npoints
        self.n_shapes = n_shapes
        self.n_samples = n_samples if use_multi_sample else 1
        self.use_multi_sample = use_multi_sample
        self.global_rot_mode = global_rot_mode
        self.rot_factor = rot_factor
        self.canonical_input = canonical_input
        self.density = density
        self.cache_base = cache_base
        self.partial_view = partial_view
        # samples are deterministic per index (int-seeded), so full-sample
        # memoisation is sound; the 4096-pt numpy FPS per sample otherwise
        # bottlenecks the TPU step (~0.5 s/sample vs ~0.1 s/step)
        self.cache_samples = cache_samples
        self.cache_limit = cache_limit
        self.indep_prismatic = indep_prismatic
        self._sample_cache: dict = {}
        self._base_cache: dict = {}
        base = seed + (0 if split == "train" else 10_000)
        self._shape_seeds = [base + i for i in range(n_shapes)]

    @property
    def num_parts(self) -> int:
        return {"eyeglasses": 3, "drawer": 4}.get(self.shape_type, 2)

    def __len__(self):
        return self.n_shapes * self.n_samples

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        if self.cache_samples and index in self._sample_cache:
            return self._sample_cache[index]
        sample = self._build_item(index)
        if self.cache_samples and len(self._sample_cache) < self.cache_limit:
            self._sample_cache[index] = sample
        return sample

    def _build_item(self, index: int) -> Dict[str, np.ndarray]:
        shape_idx, sample_idx = index // self.n_samples, index % self.n_samples
        rng = np.random.RandomState(hash((self._shape_seeds[shape_idx], sample_idx)) % (2**31))
        if self.cache_base and shape_idx in self._base_cache:
            pts, seg, joints, mesh = self._base_cache[shape_idx]
        else:
            shape_rng = np.random.RandomState(self._shape_seeds[shape_idx])
            verts, tris, tri_seg, joints = make_shape(self.shape_type, shape_rng)
            pts, seg = sample_points_on_mesh(
                verts, tris, tri_seg, np.random.RandomState(self._shape_seeds[shape_idx]),
                density=self.density,
            )
            mesh = (verts, tris, tri_seg)
            if self.cache_base:
                self._base_cache[shape_idx] = (pts, seg, joints, mesh)
        partial_rng = None
        if self.partial_view:
            # deterministic per-index camera (int-only seed: PYTHONHASHSEED-free)
            partial_rng = np.random.RandomState(
                (index * 2654435761 + 0x9E3779B1) % (2**31)
            )
        return build_sample(
            pts,
            seg,
            joints,
            shape_type=self.shape_type,
            split=self.split,
            rng=rng,
            npoints=self.npoints,
            sample_index=sample_idx,
            n_samples=self.n_samples,
            use_multi_sample=self.use_multi_sample,
            rot_factor=self.rot_factor,
            global_rot_mode=self.global_rot_mode,
            canonical_input=self.canonical_input,
            mesh=mesh if self.partial_view else None,
            partial_rng=partial_rng,
            indep_prismatic=self.indep_prismatic,
        )
