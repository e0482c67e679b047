"""HOI4D real-scan dataset loader.

The reference loads pre-downsampled per-part point clouds
``<root>/<shape_type>/<case>/objs/<part>_down_pts.npy`` plus ``mobility``/
``res`` json joint metadata (``MotionHOIDataset.py:340-380``,
``MotionHOIDatasetPartial.py:743``).  This loader reads the same layout; the
articulation/global-pose pipeline is shared with ``build_sample``.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from .articulated import JointSpec, build_sample
from .partial import make_partial


class HOI4DDataset:
    def __init__(
        self,
        root: str,
        shape_type: str = "laptop",
        split: str = "train",
        npoints: int = 512,
        n_samples: int = 100,
        use_multi_sample: bool = True,
        global_rot_mode: str = "random",
        rot_factor: float = 0.5,
        canonical_input: bool = False,
        partial: bool = False,
        train_ratio: float = 0.9,
        seed: int = 0,
    ):
        self.shape_root = os.path.join(root, shape_type)
        self.shape_type = shape_type
        self.split = split
        self.npoints = npoints
        self.partial = partial
        self.use_multi_sample = use_multi_sample and not (
            canonical_input and split == "train"
        )
        self.n_samples = n_samples if self.use_multi_sample else 1
        self.global_rot_mode = global_rot_mode
        self.rot_factor = rot_factor
        self.canonical_input = canonical_input
        self.seed = seed

        cases = sorted(
            d for d in os.listdir(self.shape_root)
            if os.path.isdir(os.path.join(self.shape_root, d))
        )
        n_train = int(len(cases) * train_ratio)
        self.cases = cases[:n_train] if split == "train" else cases[n_train:]
        self._cache: dict = {}

    @property
    def num_parts(self) -> int:
        return 2

    def __len__(self):
        return len(self.cases) * self.n_samples

    @staticmethod
    def _part_obj_names_from_result(folder: str):
        """result.json hierarchy: part id -> list of obj names (ref
        ``MotionHOIDataset.py:358-372``).  Returns None when absent."""
        res_fn = os.path.join(folder, "result.json")
        if not os.path.exists(res_fn):
            return None
        with open(res_fn) as fh:
            res = json.load(fh)

        part_to_objs: Dict[int, List[str]] = {}

        def walk(node):
            if "objs" in node:
                part_to_objs[int(node["id"])] = list(node["objs"])
            else:
                for child in node.get("children", []):
                    walk(child)

        for frame in res if isinstance(res, list) else [res]:
            walk(frame)
        return part_to_objs

    def _load_case(self, case: str):
        if case in self._cache:
            return self._cache[case]
        folder = os.path.join(self.shape_root, case)
        objs = os.path.join(folder, "objs")
        part_to_objs = self._part_obj_names_from_result(folder)
        pts_list, seg_list = [], []
        part_obj_groups: List[List[str]] = []  # obj stems per part (for meshes)
        if part_to_objs:
            # the reference path: one group of objs per part id
            n_parts_found = len(part_to_objs)
            for i, pid in enumerate(sorted(part_to_objs)):
                chunks = [
                    np.load(
                        os.path.join(objs, name + "_down_pts.npy"),
                        allow_pickle=True,
                    ).astype(np.float64)[:, :3]
                    for name in part_to_objs[pid]
                ]
                p = np.concatenate(chunks, axis=0)
                pts_list.append(p)
                seg_list.append(np.full(len(p), i, dtype=np.int64))
                part_obj_groups.append(list(part_to_objs[pid]))
            part_files = [str(pid) for pid in sorted(part_to_objs)]
        else:
            part_files = sorted(
                f for f in os.listdir(objs) if f.endswith("_down_pts.npy")
            )
            for i, f in enumerate(part_files):
                p = np.load(os.path.join(objs, f), allow_pickle=True).astype(np.float64)
                pts_list.append(p[:, :3])
                seg_list.append(np.full(len(p), i, dtype=np.int64))
                part_obj_groups.append([f[: -len("_down_pts.npy")]])
        pts = np.concatenate(pts_list)
        seg = np.concatenate(seg_list)

        # Triangle meshes, when the HOI4D layout ships <name>.obj next to the
        # down-sampled clouds (ref MotionHOIDatasetPartial renders these with
        # pyrender, :136-380).  Every part needs at least one mesh for
        # mesh-accurate partial views; otherwise partials fall back to the
        # point-splat z-buffer over the scan cloud (data/partial.py).
        mesh = None
        if all(
            any(os.path.exists(os.path.join(objs, n + ".obj")) for n in grp)
            for grp in part_obj_groups
        ):
            from .mesh import load_obj

            v_all, t_all, ts_all, off = [], [], [], 0
            for i, grp in enumerate(part_obj_groups):
                for name in grp:
                    fn = os.path.join(objs, name + ".obj")
                    if not os.path.exists(fn):
                        continue
                    v, t = load_obj(fn)
                    v_all.append(np.asarray(v, dtype=np.float64))
                    t_all.append(np.asarray(t, dtype=np.int64) + off)
                    ts_all.append(np.full(len(t), i, dtype=np.int64))
                    off += len(v)
            if t_all:
                mesh = (
                    np.concatenate(v_all),
                    np.concatenate(t_all),
                    np.concatenate(ts_all),
                )

        joints: List[JointSpec] = [
            JointSpec("none", np.zeros(3), np.array([0.0, 1.0, 0.0]))
        ]
        mob_fn = os.path.join(folder, "mobility_v2.json")
        if not os.path.exists(mob_fn):
            mob_fn = os.path.join(folder, "mobility.json")
        if os.path.exists(mob_fn):
            with open(mob_fn) as fh:
                mob = json.load(fh)
            entries = mob if isinstance(mob, list) else mob.get("joints", [])
            for e in entries[: len(part_files) - 1]:
                jd = e.get("jointData", e)
                origin = np.asarray(
                    jd.get("axis", {}).get("origin", [0, 0, 0]), dtype=np.float64
                )
                direction = np.asarray(
                    jd.get("axis", {}).get("direction", [0, 1, 0]), dtype=np.float64
                )
                joints.append(JointSpec("rotation", origin, direction))
        while len(joints) < len(part_files):
            joints.append(
                JointSpec("rotation", np.zeros(3), np.array([1.0, 0.0, 0.0]))
            )
        out = (pts, seg, joints, mesh)
        self._cache[case] = out
        return out

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        case_idx, sample_idx = index // self.n_samples, index % self.n_samples
        case = self.cases[case_idx]
        pts, seg, joints, mesh = self._load_case(case)
        import zlib

        seed32 = zlib.crc32(
            f"{self.seed}/{case}/{sample_idx}/{self.split}".encode()
        ) % (2**31)
        rng = np.random.RandomState(seed32)
        # mesh-accurate partial when triangle meshes ship with the case
        # (ref renders them with pyrender); point-splat z-buffer otherwise
        use_mesh_partial = self.partial and mesh is not None
        partial_rng = (
            np.random.RandomState((seed32 * 2654435761 + 0x9E3779B1) % (2**31))
            if use_mesh_partial
            else None
        )
        sample = build_sample(
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
            mesh=mesh if use_mesh_partial else None,
            partial_rng=partial_rng,
        )
        if self.partial and not use_mesh_partial:
            sample = make_partial(sample, rng, self.npoints)
        return sample
