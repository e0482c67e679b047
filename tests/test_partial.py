"""Partial-view (single-view depth) dataset tests."""
import numpy as np

from equi_articulated_pose_tpu.data.partial import (
    PartialSyntheticDataset,
    look_at,
    zbuffer_visible,
)


def test_look_at_points_camera_at_target():
    eye = np.array([0.0, 0.0, -1.8])
    R, t = look_at(eye)
    cam = R @ np.zeros(3) + t
    # target projects onto the -z axis in front of the camera
    assert cam[2] < 0
    np.testing.assert_allclose(cam[:2], 0.0, atol=1e-7)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-7)


def test_zbuffer_occlusion():
    rng = np.random.RandomState(0)
    # a front plate at z=-0.2 and an occluded back plate at z=+0.2 with the
    # camera looking from -z: back points behind front pixels get culled
    n = 2000
    xy = rng.uniform(-0.4, 0.4, (n, 2))
    front = np.concatenate([xy, np.full((n, 1), -0.2)], -1)
    back = np.concatenate([xy, np.full((n, 1), 0.2)], -1)
    pts = np.concatenate([front, back]).astype(np.float64)
    vis = zbuffer_visible(pts, np.random.RandomState(1))
    front_vis = vis[:n].mean()
    back_vis = vis[n:].mean()
    assert front_vis > 0.9
    assert back_vis < 0.3


def test_partial_dataset_contract():
    ds = PartialSyntheticDataset(
        "oven", npoints=96, n_shapes=1, n_samples=2, density=4000.0
    )
    item = ds[0]
    assert item["pc"].shape == (96, 3)
    assert item["pose"].shape == (96, 4, 4)
    assert item["oorr_pc"].shape == (4096, 3)
    # pose consistency still holds for the partial cloud: pose maps some
    # canonical point to the observed point — verify rotation orthonormality
    RtR = np.einsum("nij,nkj->nik", item["pose"][:, :3, :3], item["pose"][:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (96, 1, 1)), atol=1e-4)
    # partial clouds should cover fewer than all parts sometimes but labels
    # stay in range
    assert set(np.unique(item["label"])) <= {0, 1}
