"""Fused chamfer (XLA path on CPU; the Pallas path is exercised on TPU by
bench/integration): forward parity + custom-VJP gradient parity."""
import numpy as np
import jax
import jax.numpy as jnp

from equi_articulated_pose_tpu.ops.chamfer import chamfer_sq
from equi_articulated_pose_tpu.ops.pallas.chamfer import chamfer_sq_fused


def test_forward_matches_reference(rng):
    a = jnp.asarray(rng.randn(3, 40, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3, 56, 3).astype(np.float32))
    d1, d2 = chamfer_sq_fused(a, b)
    r1, r2 = chamfer_sq(a, b)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(r2), rtol=1e-5, atol=1e-6)


def test_batched_leading_dims(rng):
    a = jnp.asarray(rng.randn(2, 3, 5, 16, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 3, 5, 24, 3).astype(np.float32))
    d1, d2 = chamfer_sq_fused(a, b)
    assert d1.shape == (2, 3, 5, 16)
    assert d2.shape == (2, 3, 5, 24)


def test_gradients_match_autodiff(rng):
    a = jnp.asarray(rng.randn(2, 20, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 28, 3).astype(np.float32))

    def loss_fused(a, b):
        d1, d2 = chamfer_sq_fused(a, b)
        return d1.mean() + 0.5 * d2.mean()

    def loss_ref(a, b):
        d1, d2 = chamfer_sq(a, b)
        return d1.mean() + 0.5 * d2.mean()

    ga = jax.grad(loss_fused, argnums=(0, 1))(a, b)
    gr = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-6)
