"""Real-format loader regression tests.

The fixtures replicate the reference's on-disk layouts exactly:
Shape2Motion — ``summary.obj`` + ``sfs_idx_to_dof_name_idx.npy`` (a PICKLED
dict {triangle: dof}, ref ``data_utils.py:173-183``) + hierarchical
``motion_attributes.json`` (ref ``data_utils.py:127-151``); HOI4D —
``objs/<name>_down_pts.npy`` + ``result.json`` part hierarchy +
``mobility_v2.json`` (ref ``MotionHOIDataset.py:340-385``).
"""
import os

import numpy as np

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

SAMPLE_KEYS = {
    "pc", "ori_pc", "canon_pc", "oorr_pc", "oorr_canon_pc", "label",
    "oorr_label", "pose", "pose_segs", "part_state_rots", "part_ref_rots",
    "part_ref_trans", "part_state_trans_bbox", "part_ref_trans_bbox",
    "part_axis", "part_pv_offset", "part_pv_point", "part_angles",
}


def test_load_pickled_dict_tri_seg():
    from equi_articulated_pose_tpu.data.mesh import load_triangles_to_seg_idx

    seg = load_triangles_to_seg_idx(
        os.path.join(FIX, "shape2motion/oven/0001/sfs_idx_to_dof_name_idx.npy")
    )
    assert seg.shape == (24,)
    assert (seg[:12] == 0).all() and (seg[12:] == 1).all()


def test_load_hierarchical_motion_attributes():
    from equi_articulated_pose_tpu.data.mesh import load_motion_attributes

    attrs = load_motion_attributes(
        os.path.join(FIX, "shape2motion/oven/0001/motion_attributes.json")
    )
    assert len(attrs) == 2
    assert attrs[0]["motion_type"] == "none"
    assert attrs[1]["motion_type"] == "rotation"
    np.testing.assert_allclose(attrs[1]["direction"], [1.0, 0.0, 0.0])


def test_motion_dataset_full_contract_from_fixture():
    from equi_articulated_pose_tpu.data.shape2motion import MotionDataset

    ds = MotionDataset(
        os.path.join(FIX, "shape2motion"),
        shape_type="oven",
        npoints=128,
        n_samples=2,
        train_ratio=0.5,
    )
    assert len(ds) == 2  # 1 train shape x 2 samples
    s = ds[0]
    assert SAMPLE_KEYS <= set(s.keys())
    assert s["pc"].shape == (128, 3)
    assert s["oorr_pc"].shape == (4096, 3)
    assert s["pose_segs"].shape[0] == 2
    assert set(np.unique(s["label"])) <= {0, 1}
    # the moving part's axis comes from the json (x-axis, rotated by R1):
    # unit length survives
    np.testing.assert_allclose(
        np.linalg.norm(s["part_axis"], axis=-1), 1.0, atol=1e-5
    )
    assert np.isfinite(s["pc"]).all()


def test_partial_motion_dataset_from_fixture():
    from equi_articulated_pose_tpu.data.partial import PartialMotionDataset

    ds = PartialMotionDataset(
        os.path.join(FIX, "shape2motion"),
        shape_type="oven",
        npoints=96,
        n_samples=2,
        train_ratio=0.5,
    )
    s = ds[0]
    assert s["pc"].shape == (96, 3)
    a, b = ds[1], ds[1]
    np.testing.assert_array_equal(a["pc"], b["pc"])


def test_hoi4d_dataset_from_fixture():
    from equi_articulated_pose_tpu.data.hoi4d import HOI4DDataset

    ds = HOI4DDataset(
        os.path.join(FIX, "hoi4d"),
        shape_type="laptop",
        npoints=128,
        n_samples=2,
        train_ratio=0.5,
    )
    assert len(ds) == 2
    s = ds[0]
    assert SAMPLE_KEYS <= set(s.keys())
    assert s["pc"].shape == (128, 3)
    # parts come from result.json grouping (2 parts)
    assert s["pose_segs"].shape[0] == 2
    # the joint axis from mobility_v2.json is x-ish after normalisation
    assert np.isfinite(s["part_axis"]).all()


def test_hoi4d_mesh_rasterized_partial():
    """When <name>.obj part meshes ship with a case, the partial variant
    rasterizes them (mesh-accurate occlusion, ref MotionHOIDatasetPartial)
    instead of point-splatting the scan cloud."""
    from equi_articulated_pose_tpu.data.hoi4d import HOI4DDataset

    ds = HOI4DDataset(
        os.path.join(FIX, "hoi4d"),
        shape_type="laptop",
        npoints=128,
        n_samples=2,
        train_ratio=0.5,
        partial=True,
    )
    pts, seg, joints, mesh = ds._load_case(ds.cases[0])
    assert mesh is not None, "fixture .obj meshes should be picked up"
    verts, tris, tri_seg = mesh
    assert tris.shape[1] == 3 and tri_seg.shape[0] == tris.shape[0]
    assert set(np.unique(tri_seg)) == {0, 1}
    s = ds[0]
    assert s["pc"].shape == (128, 3)
    assert np.isfinite(s["pc"]).all()
    # a single-view scan of a two-part laptop still sees both parts from
    # almost every camera, but never MORE points than the complete cloud
    assert set(np.unique(s["label"])) <= {0, 1}
