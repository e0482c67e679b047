"""Pallas FPS kernel: index-exact vs the XLA fori_loop implementation
(interpret mode on CPU; the TPU lowering is exercised by training/bench)."""
import numpy as np
import jax
import jax.numpy as jnp

from equi_articulated_pose_tpu.ops.pallas.fps import fps_fused
from equi_articulated_pose_tpu.ops.sampling import furthest_point_sampling


def _xla_fps(xyz, m):
    # force the XLA path regardless of backend
    import equi_articulated_pose_tpu.ops.sampling as s
    import jax

    B, N, _ = xyz.shape
    x = xyz.astype(jnp.float32)
    valid = jnp.sum(x * x, axis=-1) > s.SHADOW_NORM_SQ

    def body(i, carry):
        dists, idxs = carry
        last = jnp.take_along_axis(x, idxs[:, i - 1][:, None, None], axis=1)
        d = jnp.sum((x - last) ** 2, axis=-1)
        dists = jnp.minimum(dists, d)
        score = jnp.where(valid, dists, -jnp.inf)
        nxt = jnp.argmax(score, axis=-1).astype(jnp.int32)
        return dists, idxs.at[:, i].set(nxt)

    idxs0 = jnp.zeros((B, m), dtype=jnp.int32)
    dists0 = jnp.full((B, N), jnp.inf, dtype=jnp.float32)
    return jax.lax.fori_loop(1, m, body, (dists0, idxs0))[1]


def test_fps_fused_index_exact():
    rng = np.random.RandomState(0)
    for B, N, m in [(2, 96, 32), (3, 380, 190), (1, 130, 130)]:
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        ref = np.asarray(_xla_fps(xyz, m))
        got = np.asarray(fps_fused(xyz, m, interpret=True))
        np.testing.assert_array_equal(got, ref)


def test_fps_fused_shadow_guard():
    rng = np.random.RandomState(1)
    xyz = np.asarray(rng.randn(2, 64, 3), np.float32)
    xyz[:, 5] = 0.0  # shadow point: never selected (except forced index 0)
    out = np.asarray(fps_fused(jnp.asarray(xyz), 32, interpret=True))
    assert not (out[:, 1:] == 5).any()
    ref = np.asarray(_xla_fps(jnp.asarray(xyz), 32))
    np.testing.assert_array_equal(out, ref)


def test_fps_public_entry_dispatch():
    # off-TPU the public entry stays on the XLA path and matches the kernel
    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.randn(2, 100, 3).astype(np.float32))
    a = np.asarray(furthest_point_sampling(xyz, 50))
    b = np.asarray(fps_fused(xyz, 50, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_fps_fused_grad_through():
    """fps_fused sits on the stage-1 train path (slot_pose union FPS); it
    must be transparent to reverse-mode AD (indices are non-differentiable,
    the tangent is cut at the input — a bare pallas_call has no autodiff
    rule and jax.grad over it raises 'Linearization failed')."""
    rng = np.random.RandomState(3)
    xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))

    def f(pts):
        idx = fps_fused(pts, 8, interpret=True)
        sel = jnp.take_along_axis(pts, idx[..., None], axis=1)
        return jnp.sum(sel**2)

    val, grad = jax.value_and_grad(f)(xyz)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
