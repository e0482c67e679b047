"""KernelPropagation, blurring/pooling, anchor interpolation, 2D intra conv."""
import numpy as np
import jax
import jax.numpy as jnp

from equi_articulated_pose_tpu.geom import so3
from equi_articulated_pose_tpu.nn.containers import SpherePoints
from equi_articulated_pose_tpu.nn.extras import (
    IntraSO3Conv2D,
    KernelPropagation,
    anchor_interp_weights,
    anchor_prop,
    inter_blurring,
    inter_pooling,
)


def test_kernel_propagation(rng):
    frag = jnp.asarray(rng.randn(2, 200, 3).astype(np.float32) * 0.3)
    clouds = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32) * 0.3)
    kp = KernelPropagation(dim_out=8, n_center=16, kernel_size=1, radius=0.4,
                           sigma=0.08)
    params = kp.init(jax.random.PRNGKey(0), frag, clouds)
    out = kp.apply(params, frag, clouds)
    assert out.xyz.shape == (2, 16, 3)
    assert out.feats.shape == (2, 16, 60, 8)
    assert np.isfinite(np.asarray(out.feats)).all()


def test_blurring_and_pooling(rng):
    xyz = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32) * 0.3)
    feats = jnp.asarray(rng.randn(2, 32, 4, 6).astype(np.float32))
    blurred = inter_blurring(xyz, feats, 0.5, 8)
    assert blurred.shape == feats.shape
    # blurring is a contraction toward neighbourhood means: variance drops
    assert float(blurred.var()) < float(feats.var())
    new_xyz, pooled = inter_pooling(xyz, feats, 2, 0.5, 8)
    assert new_xyz.shape == (2, 16, 3)
    assert pooled.shape == (2, 16, 4, 6)


def test_anchor_interp_identity():
    # generic direction (not on a symmetry axis, else orbits coincide)
    v = np.array([0.31, 0.52, 0.80])
    v /= np.linalg.norm(v)
    a = jnp.asarray(so3.get_anchors(60) @ v)
    idx, w = anchor_interp_weights(a, a, k=3)
    # nearest neighbour of each anchor is itself with dominant weight
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(60))
    feats = jnp.asarray(np.random.RandomState(0).randn(2, 5, 60, 4).astype(np.float32))
    out = anchor_prop(feats, idx, w)
    assert out.shape == feats.shape
    # self weight is ~0.9997 (inverse-distance softening), not exactly 1
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=2e-3)


def test_intra_2d(rng):
    xyz = jnp.asarray(rng.randn(1, 10, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 10, 240, 4).astype(np.float32))
    mod = IntraSO3Conv2D(dim_out=6)
    params = mod.init(jax.random.PRNGKey(1), SpherePoints(xyz, feats, None))
    out = mod.apply(params, SpherePoints(xyz, feats, None))
    assert out.feats.shape == (1, 10, 240, 6)
