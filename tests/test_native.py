"""Native C++ data-engine kernels vs numpy references."""
import numpy as np
import pytest

from equi_articulated_pose_tpu.native import pointops
from equi_articulated_pose_tpu.data.mesh import _fps_numpy_impl


requires_native = pytest.mark.skipif(
    not pointops.have_native(), reason="libpointops.so unavailable"
)


@requires_native
def test_native_fps_matches_numpy(rng):
    pts = rng.randn(200, 3).astype(np.float32)
    got = pointops.fps(pts, 32)
    want = _fps_numpy_impl(pts, 32)
    np.testing.assert_array_equal(got, want)


@requires_native
def test_native_fps_speed(rng):
    import time

    pts = rng.randn(20000, 3).astype(np.float32)
    t0 = time.perf_counter()
    pointops.fps(pts, 2048)
    native_t = time.perf_counter() - t0
    # native must beat a healthy bound (numpy impl takes ~1s here)
    assert native_t < 0.5


@requires_native
def test_native_sample_mesh(rng):
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], dtype=np.float64
    )
    tris = np.array([[0, 1, 2], [1, 3, 2]], dtype=np.int64)
    seg = np.array([0, 1], dtype=np.int64)
    counts = np.array([100, 50], dtype=np.int64)
    pts, pseg = pointops.sample_mesh(verts, tris, seg, counts, seed=7)
    assert pts.shape == (150, 3)
    assert (pseg[:100] == 0).all() and (pseg[100:] == 1).all()
    # samples lie in the unit square plane
    assert pts[:, 2].max() == 0.0
    assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 1
    # deterministic per seed
    pts2, _ = pointops.sample_mesh(verts, tris, seg, counts, seed=7)
    np.testing.assert_allclose(pts, pts2)


@requires_native
def test_native_ball_query_matches_reference_semantics(rng):
    q = rng.randn(16, 3).astype(np.float32)
    s = rng.randn(64, 3).astype(np.float32)
    out = pointops.ball_query(q, s, 1.0, 8)
    for i in range(16):
        d2 = ((s - q[i]) ** 2).sum(-1)
        found = np.where(d2 < 1.0)[0]
        if len(found) == 0:
            np.testing.assert_array_equal(out[i], 0)
            continue
        row = np.full(8, found[0], dtype=np.int32)
        take = found[:8]
        row[: len(take)] = take
        np.testing.assert_array_equal(out[i], row)
