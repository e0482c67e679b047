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


def test_mesh_rasterizer_occlusion():
    """Two parallel quads; the front one must hide the back one."""
    from equi_articulated_pose_tpu.data.rasterize import rasterize_depth_points

    def quad(z, i0):
        v = np.array(
            [[-0.4, -0.4, z], [0.4, -0.4, z], [0.4, 0.4, z], [-0.4, 0.4, z]]
        )
        t = np.array([[i0, i0 + 1, i0 + 2], [i0, i0 + 2, i0 + 3]])
        return v, t

    v0, t0 = quad(-0.2, 0)   # nearer the camera (camera looks from -z)
    v1, t1 = quad(0.2, 4)
    verts = np.concatenate([v0, v1])
    tris = np.concatenate([t0, t1])
    labels = np.array([0, 0, 1, 1])
    pts, lbl = rasterize_depth_points(
        verts[tris], labels, np.random.RandomState(3)
    )
    assert len(pts) > 500
    frac_back = (lbl == 1).mean()
    assert frac_back < 0.25, frac_back  # back plate mostly occluded
    # visible points lie on the two planes
    assert np.abs(np.abs(pts[:, 2]) - 0.2).max() < 1e-3


def test_mesh_rasterizer_deterministic():
    ds = PartialSyntheticDataset(
        "oven", npoints=64, n_shapes=1, n_samples=2, density=4000.0
    )
    a, b = ds[1], ds[1]
    np.testing.assert_array_equal(a["pc"], b["pc"])
    np.testing.assert_array_equal(a["label"], b["label"])


def test_partial_sees_fewer_points_than_complete():
    """Statistical parity probe: the single-view scan must cover clearly less
    of the dense surface than the complete cloud (occlusion is real)."""
    from equi_articulated_pose_tpu.data.synthetic import SyntheticDataset
    from equi_articulated_pose_tpu.ops.sampling import pairwise_sqdist
    import jax.numpy as jnp

    full = SyntheticDataset("oven", npoints=64, n_shapes=1, n_samples=2,
                            density=4000.0, global_rot_mode="none")
    part = PartialSyntheticDataset("oven", npoints=64, n_shapes=1, n_samples=2,
                                   density=4000.0, global_rot_mode="none")
    f, p = full[0], part[0]
    # coverage: fraction of the complete oorr cloud within eps of a partial pt
    d2 = np.asarray(
        pairwise_sqdist(jnp.asarray(f["oorr_pc"][None]), jnp.asarray(p["oorr_pc"][None]))
    )[0]
    covered = (d2.min(-1) < 1e-3).mean()
    assert covered < 0.9, covered  # some of the surface is hidden
    assert covered > 0.2, covered  # but a real fraction is visible
