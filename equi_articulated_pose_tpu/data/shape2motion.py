"""Shape2Motion dataset loader (MotionDataset equivalent).

Reads the reference's on-disk layout (``MotionDataset.py:123-190``):

    <root>/<shape_type>/<shape_id>/summary.obj
                                  /sfs_idx_to_dof_name_idx.npy
                                  /motion_attributes.json

and builds samples through the shared ``build_sample`` pipeline.  Split is the
reference's 90/10 sorted-prefix rule.
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from .articulated import JointSpec, build_sample
from .mesh import (
    load_motion_attributes,
    load_obj,
    load_triangles_to_seg_idx,
    sample_points_on_mesh,
)


class MotionDataset:
    MESH_FN = "summary.obj"
    SEG_FN = "sfs_idx_to_dof_name_idx.npy"
    ATTR_FN = "motion_attributes.json"

    def __init__(
        self,
        root: str,
        shape_type: str = "oven",
        split: str = "train",
        npoints: int = 512,
        n_samples: int = 100,
        use_multi_sample: bool = True,
        global_rot_mode: str = "random",
        rot_factor: float = 0.5,
        canonical_input: bool = False,
        train_ratio: float = 0.9,
        seed: int = 0,
        split_file: str | None = None,
        partial_view: bool = False,
        indep_prismatic: bool = False,
    ):
        self.partial_view = partial_view
        self.indep_prismatic = indep_prismatic
        self.shape_root = os.path.join(root, shape_type)
        self.shape_type = shape_type
        self.split = split
        self.npoints = npoints
        self.use_multi_sample = use_multi_sample and not (
            canonical_input and split == "train"
        )
        self.n_samples = n_samples if self.use_multi_sample else 1
        self.global_rot_mode = global_rot_mode
        self.rot_factor = rot_factor
        self.canonical_input = canonical_input
        self.seed = seed

        ids = sorted(
            d for d in os.listdir(self.shape_root)
            if not d.startswith(".") and os.path.isdir(os.path.join(self.shape_root, d))
        )
        if split_file is not None:
            # explicit id list (the MotionDataset2/MDV02 alternate-split
            # mechanism, SURVEY.md S4): json {"train": [...], "test": [...]}
            # or a plain text file of ids for this split
            import json as _json

            with open(split_file) as fh:
                content = fh.read()
            try:
                mapping = _json.loads(content)
                listed = mapping[split]
            except (ValueError, KeyError):
                listed = [l.strip() for l in content.splitlines() if l.strip()]
            keep = set(map(str, listed))
            self.shape_ids = [i for i in ids if i in keep]
        else:
            n_train = int(len(ids) * train_ratio)
            self.shape_ids = ids[:n_train] if split == "train" else ids[n_train:]
        self._cache: dict = {}

    @property
    def num_parts(self) -> int:
        return {"eyeglasses": 3, "drawer": 4}.get(self.shape_type, 2)

    def __len__(self):
        return len(self.shape_ids) * self.n_samples

    def _load_shape(self, shape_id: str):
        if shape_id in self._cache:
            return self._cache[shape_id]
        folder = os.path.join(self.shape_root, shape_id)
        verts, tris = load_obj(os.path.join(folder, self.MESH_FN))
        tri_seg = load_triangles_to_seg_idx(os.path.join(folder, self.SEG_FN))
        attrs = load_motion_attributes(os.path.join(folder, self.ATTR_FN))
        joints = []
        for a in attrs:
            # eyeglasses attribute-order fix (ref MotionDataset.py:376-378)
            joints.append(
                JointSpec(
                    a.get("motion_type", "none"),
                    np.asarray(a.get("center", [0, 0, 0]), dtype=np.float64),
                    np.asarray(a.get("direction", [0, 1, 0]), dtype=np.float64),
                )
            )
        if self.shape_type == "eyeglasses" and len(joints) >= 3:
            joints[1], joints[2] = joints[2], joints[1]
        out = (verts, tris, tri_seg, joints)
        self._cache[shape_id] = out
        return out

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        shape_idx, sample_idx = index // self.n_samples, index % self.n_samples
        shape_id = self.shape_ids[shape_idx]
        verts, tris, tri_seg, joints = self._load_shape(shape_id)
        # int-only seed via crc32: str hashing is PYTHONHASHSEED-randomised
        import zlib

        seed32 = zlib.crc32(
            f"{self.seed}/{shape_id}/{sample_idx}/{self.split}".encode()
        ) % (2**31)
        rng = np.random.RandomState(seed32)
        pts, seg = sample_points_on_mesh(verts, tris, tri_seg, rng, density=500.0)
        partial_rng = (
            np.random.RandomState((seed32 * 2654435761 + 0x9E3779B1) % (2**31))
            if self.partial_view
            else None
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
            mesh=(verts, tris, tri_seg) if self.partial_view else None,
            partial_rng=partial_rng,
            indep_prismatic=self.indep_prismatic,
        )
