"""Fused Pallas inter-conv kernel: numerics vs the XLA composition
(interpret mode on CPU; the TPU lowering is exercised by the bench)."""
import numpy as np
import jax
import jax.numpy as jnp

from equi_articulated_pose_tpu.geom import so3
from equi_articulated_pose_tpu.geom.kernels import (
    KERNEL_CONDENSE_RATIO,
    spherical_kernel_points,
)
from equi_articulated_pose_tpu.ops.pallas.interconv import (
    inter_conv_fused,
    inter_conv_fused_reference,
)


def _setup(B=2, N=96, C=16, D=32, nn=8, M=96, ks_level=1, seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, N, 60, C).astype(np.float32))
    ball = jnp.asarray(rng.randint(0, N, (B, M, nn)).astype(np.int32))
    gx = jnp.asarray(rng.randn(B, M, nn, 3).astype(np.float32) * 0.1)
    anchors = jnp.asarray(so3.get_anchors(60))
    kern = jnp.asarray(
        spherical_kernel_points(KERNEL_CONDENSE_RATIO * 0.4, ks_level)
    )
    W = jnp.asarray(rng.randn(kern.shape[0], C, D).astype(np.float32) * 0.05)
    return feats, ball, gx, anchors, kern, W


def test_fused_interconv_matches_reference():
    feats, ball, gx, anchors, kern, W = _setup()
    sigma = 0.1
    ref = inter_conv_fused_reference(feats, ball, gx, anchors, kern, sigma, W)
    out = inter_conv_fused(
        feats, ball, gx, anchors, kern, sigma, W,
        chunk_a=12, compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_fused_interconv_ragged_m():
    """M not a multiple of the tile: padded rows must not corrupt output."""
    feats, ball, gx, anchors, kern, W = _setup(M=50, seed=1)
    sigma = 0.15
    ref = inter_conv_fused_reference(feats, ball, gx, anchors, kern, sigma, W)
    out = inter_conv_fused(
        feats, ball, gx, anchors, kern, sigma, W,
        chunk_a=12, compute_dtype=jnp.float32, interpret=True,
    )
    assert out.shape == ref.shape == (2, 50, 60, 32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_fused_interconv_gradients_match_reference():
    """The custom VJP (Pallas forward, anchor-chunked XLA backward) must give
    the same gradients as differentiating the XLA reference directly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from equi_articulated_pose_tpu.geom import so3 as so3g
    from equi_articulated_pose_tpu.geom.kernels import spherical_kernel_points
    from equi_articulated_pose_tpu.ops.pallas.interconv import (
        inter_conv_fused,
        inter_conv_fused_reference,
    )

    rng = np.random.RandomState(0)
    B, N, A, C, D, nn = 1, 40, 12, 8, 16, 8
    feats = jnp.asarray(rng.randn(B, N, A, C).astype(np.float32))
    xyz = rng.randn(B, N, 3).astype(np.float32) * 0.3
    ball_idx = jnp.asarray(rng.randint(0, N, (B, N, nn)).astype(np.int32))
    gx = jnp.asarray(
        np.take_along_axis(xyz[:, :, None, :], ball_idx[..., None], axis=1)
        - xyz[:, :, None, :]
    )
    anchors = jnp.asarray(so3g.get_anchors(60)[:A])
    kernels = jnp.asarray(spherical_kernel_points(0.3, 1))
    W = jnp.asarray(rng.randn(kernels.shape[0], C, D).astype(np.float32) * 0.1)
    sigma = 0.08
    cot = jnp.asarray(rng.randn(B, N, A, D).astype(np.float32))

    def loss_fused(f, g_, w_):
        out = inter_conv_fused(
            f, ball_idx, g_, anchors, kernels, sigma, w_,
            chunk_a=4, compute_dtype=jnp.float32, interpret=True,
        )
        return jnp.sum(out * cot)

    def loss_ref(f, g_, w_):
        out = inter_conv_fused_reference(
            f, ball_idx, g_, anchors, kernels, sigma, w_
        )
        return jnp.sum(out * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(feats, gx, W)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(feats, gx, W)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_fused_interconv_pallas_backward_matches_reference():
    """The fully-fused backward (two Pallas kernels emitting dfeats /
    dgrouped_xyz / dW directly) must match differentiating the XLA
    reference — including ragged M (padded cotangent rows contribute 0)."""
    rng = np.random.RandomState(3)
    B, N, A, C, D, nn, M = 1, 40, 12, 8, 16, 8, 37
    feats = jnp.asarray(rng.randn(B, N, A, C).astype(np.float32))
    xyz = rng.randn(B, N, 3).astype(np.float32) * 0.3
    ball_idx = jnp.asarray(rng.randint(0, N, (B, M, nn)).astype(np.int32))
    gx = jnp.asarray(rng.randn(B, M, nn, 3).astype(np.float32) * 0.15)
    anchors = jnp.asarray(so3.get_anchors(60)[:A])
    kernels = jnp.asarray(spherical_kernel_points(0.3, 1))
    W = jnp.asarray(rng.randn(kernels.shape[0], C, D).astype(np.float32) * 0.1)
    sigma = 0.08
    cot = jnp.asarray(rng.randn(B, M, A, D).astype(np.float32))

    def loss_fused(f, g_, w_):
        out = inter_conv_fused(
            f, ball_idx, g_, anchors, kernels, sigma, w_,
            compute_dtype=jnp.float32, interpret=True, fused_bwd=True,
        )
        return jnp.sum(out * cot)

    def loss_ref(f, g_, w_):
        out = inter_conv_fused_reference(
            f, ball_idx, g_, anchors, kernels, sigma, w_
        )
        return jnp.sum(out * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(feats, gx, W)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(feats, gx, W)
    for name, a, b in zip(("dfeats", "dgx", "dW"), gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


def test_fused_bwd_degenerate_channels_grads_match():
    """C=1 (the backbones' occupancy layer) with fused_bwd=True: routed to
    the XLA backward (the f32 Pallas bwd kernel overflows scoped vmem on
    v5e — interconv.py inter_conv_fused) but gradients must still match the
    reference exactly."""
    rng = np.random.RandomState(5)
    B, N, A, C, D, nn, M = 1, 40, 12, 1, 16, 8, 37
    feats = jnp.asarray(rng.randn(B, N, A, C).astype(np.float32))
    ball_idx = jnp.asarray(rng.randint(0, N, (B, M, nn)).astype(np.int32))
    gx = jnp.asarray(rng.randn(B, M, nn, 3).astype(np.float32) * 0.15)
    anchors = jnp.asarray(so3.get_anchors(60)[:A])
    kernels = jnp.asarray(spherical_kernel_points(0.3, 1))
    W = jnp.asarray(rng.randn(kernels.shape[0], C, D).astype(np.float32) * 0.1)
    sigma = 0.08
    cot = jnp.asarray(rng.randn(B, M, A, D).astype(np.float32))

    def loss_fused(f, g_, w_):
        out = inter_conv_fused(
            f, ball_idx, g_, anchors, kernels, sigma, w_,
            compute_dtype=jnp.float32, interpret=True, fused_bwd=True,
        )
        return jnp.sum(out * cot)

    def loss_ref(f, g_, w_):
        out = inter_conv_fused_reference(
            f, ball_idx, g_, anchors, kernels, sigma, w_
        )
        return jnp.sum(out * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(feats, gx, W)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(feats, gx, W)
    for name, a, b in zip(("dfeats", "dgx", "dW"), gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )
