"""Golden-value tests for sampling/grouping/chamfer ops vs NumPy references
(SURVEY.md §4(c))."""
import numpy as np
import jax
import jax.numpy as jnp

from equi_articulated_pose_tpu import ops


def np_fps(xyz, m):
    """NumPy re-implementation of the reference FPS
    (grouping_cuda_kernel.cu:352-466): start at 0, shadow guard 1e-3."""
    B, N, _ = xyz.shape
    out = np.zeros((B, m), dtype=np.int32)
    for b in range(B):
        pts = xyz[b]
        valid = (pts ** 2).sum(-1) > 1e-3
        dist = np.full(N, np.inf)
        cur = 0
        for i in range(1, m):
            d = ((pts - pts[cur]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            score = np.where(valid, dist, -np.inf)
            cur = int(np.argmax(score))
            out[b, i] = cur
    return out


def np_ball_query(query, support, radius, nsample):
    B, M, _ = query.shape
    N = support.shape[1]
    out = np.zeros((B, M, nsample), dtype=np.int32)
    for b in range(B):
        for i in range(M):
            d2 = ((support[b] - query[b, i]) ** 2).sum(-1)
            found = np.where(d2 < radius * radius)[0]
            if len(found) == 0:
                out[b, i] = 0
                continue
            row = np.full(nsample, found[0], dtype=np.int32)
            take = found[:nsample]
            row[: len(take)] = take
            out[b, i] = row
    return out


def test_fps_matches_numpy(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    got = np.asarray(ops.furthest_point_sampling(jnp.asarray(xyz), 16))
    want = np_fps(xyz, 16)
    np.testing.assert_array_equal(got, want)


def test_fps_skips_shadow_points(rng):
    xyz = rng.randn(1, 32, 3).astype(np.float32) + 2.0
    xyz[0, 5] = 0.0  # shadow point at origin
    got = np.asarray(ops.furthest_point_sampling(jnp.asarray(xyz), 10))
    assert 5 not in got[0]


def test_ball_query_matches_numpy(rng):
    q = rng.randn(2, 16, 3).astype(np.float32)
    s = rng.randn(2, 48, 3).astype(np.float32)
    r, k = 1.0, 8
    got = np.asarray(ops.ball_query(jnp.asarray(q), jnp.asarray(s), r, k))
    want = np_ball_query(q, s, r, k)
    np.testing.assert_array_equal(got, want)


def test_gather_group(rng):
    pts = rng.randn(2, 20, 5).astype(np.float32)
    idx = rng.randint(0, 20, (2, 7)).astype(np.int32)
    got = np.asarray(ops.gather_points(jnp.asarray(pts), jnp.asarray(idx)))
    want = np.stack([pts[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)

    gidx = rng.randint(0, 20, (2, 7, 4)).astype(np.int32)
    got = np.asarray(ops.group_points(jnp.asarray(pts), jnp.asarray(gidx)))
    want = np.stack([pts[b][gidx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)


def test_chamfer_matches_numpy(rng):
    a = rng.randn(3, 40, 3).astype(np.float32)
    b = rng.randn(3, 30, 3).astype(np.float32)
    d1, d2 = ops.chamfer_sq(jnp.asarray(a), jnp.asarray(b))
    d2_full = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d1), d2_full.min(-1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), d2_full.min(-2), rtol=1e-4, atol=1e-5)


def test_chamfer_grad_finite(rng):
    a = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 24, 3).astype(np.float32))

    def loss(a, b):
        d1, d2 = ops.chamfer_sq(a, b)
        return d1.mean() + d2.mean()

    g = jax.grad(loss)(a, b)
    assert np.isfinite(np.asarray(g)).all()
    # numerical check on one coordinate
    eps = 1e-3
    ap = a.at[0, 0, 0].add(eps)
    am = a.at[0, 0, 0].add(-eps)
    num = (loss(ap, b) - loss(am, b)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g)[0, 0, 0], float(num), rtol=1e-2, atol=1e-3)


def test_chamfer_chunked(rng):
    a = jnp.asarray(rng.randn(10, 16, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(10, 20, 3).astype(np.float32))
    d1, d2 = ops.chamfer_sq(a, b)
    c1, c2 = ops.chamfer_chunked(a, b, chunk=4)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(d1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(d2), rtol=1e-5, atol=1e-6)
