"""Anchor-orbit model parallelism: exact parity with the unsharded ops on a
virtual mesh (conftest provisions 8 CPU devices)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from equi_articulated_pose_tpu.geom import so3 as so3g
from equi_articulated_pose_tpu.geom.kernels import spherical_kernel_points
from equi_articulated_pose_tpu.nn.so3conv import (
    inter_conv_contract,
    inter_kernel_weights,
    intra_conv_accumulate,
)
from equi_articulated_pose_tpu.ops.sampling import ball_query, group_points
from equi_articulated_pose_tpu.parallel.anchor_shard import (
    ANCHOR_AXIS,
    anchor_attn_pool_sharded,
    anchor_max_pool_sharded,
    anchor_mean_pool_sharded,
    inter_conv_anchor_sharded,
    intra_conv_anchor_sharded,
    make_mesh_2d,
)

A, NA = 60, 4  # anchor mesh size 4 -> 15 anchors per device


@pytest.fixture(scope="module")
def mesh():
    return make_mesh_2d(1, NA)


def _spec(mesh, *axes):
    return NamedSharding(mesh, P(*axes))


def test_inter_conv_anchor_sharded_exact(mesh, rng):
    B, N, C, D, nn_ = 2, 48, 8, 16, 12
    ks = spherical_kernel_points(0.4 * 0.7, 1).shape[0]
    anchors = jnp.asarray(so3g.get_anchors(A))
    kernels = jnp.asarray(spherical_kernel_points(0.4 * 0.7, 1))
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)
    feats = jnp.asarray(rng.randn(B, N, A, C).astype(np.float32))
    W = jnp.asarray(rng.randn(ks, C, D).astype(np.float32) * 0.1)
    idx = ball_query(xyz, xyz, 0.4, nn_)
    gx = jnp.take_along_axis(
        xyz[:, None].repeat(N, 1), idx[..., None], axis=2
    ) - xyz[:, :, None]

    # unsharded reference
    w = inter_kernel_weights(gx, anchors, kernels, 0.16)
    ref = inter_conv_contract(group_points(feats, idx), w, W)

    fn = shard_map(
        lambda f, i, g: inter_conv_anchor_sharded(
            f, i, g, anchors, kernels, 0.16, W
        ),
        mesh=mesh,
        in_specs=(P(None, None, ANCHOR_AXIS, None), P(), P()),
        out_specs=P(None, None, ANCHOR_AXIS, None),
    )
    out = fn(feats, idx, gx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_intra_conv_anchor_sharded_exact(mesh, rng):
    B, N, C, D = 2, 32, 8, 8
    trace = jnp.asarray(so3g.TRACE_IDX)
    K = trace.shape[1]
    feats = jnp.asarray(rng.randn(B, N, A, C).astype(np.float32))
    W = jnp.asarray(rng.randn(K, C, D).astype(np.float32) * 0.1)

    ref = intra_conv_accumulate(feats, trace, W)

    fn = shard_map(
        lambda f: intra_conv_anchor_sharded(f, trace, W),
        mesh=mesh,
        in_specs=(P(None, None, ANCHOR_AXIS, None),),
        out_specs=P(None, None, ANCHOR_AXIS, None),
    )
    out = fn(feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_anchor_pools_sharded_exact(mesh, rng):
    B, C = 3, 10
    feats = jnp.asarray(rng.randn(B, A, C).astype(np.float32))
    logits = jnp.asarray(rng.randn(B, A).astype(np.float32))

    ref_max = jnp.max(feats, axis=1)
    ref_mean = jnp.mean(feats, axis=1)
    attn_ref = jax.nn.softmax(logits, axis=1)
    ref_pool = jnp.einsum("ba,bac->bc", attn_ref, feats)

    f_max = shard_map(
        lambda f: anchor_max_pool_sharded(f),
        mesh=mesh, in_specs=(P(None, ANCHOR_AXIS, None),), out_specs=P(),
    )
    f_mean = shard_map(
        lambda f: anchor_mean_pool_sharded(f),
        mesh=mesh, in_specs=(P(None, ANCHOR_AXIS, None),), out_specs=P(),
    )
    f_attn = shard_map(
        lambda f, l: anchor_attn_pool_sharded(f, l),
        mesh=mesh,
        in_specs=(P(None, ANCHOR_AXIS, None), P(None, ANCHOR_AXIS)),
        out_specs=(P(), P(None, ANCHOR_AXIS)),
    )
    np.testing.assert_allclose(np.asarray(f_max(feats)), np.asarray(ref_max), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_mean(feats)), np.asarray(ref_mean), atol=1e-6)
    pooled, attn = f_attn(feats, logits)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref_pool), atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(attn_ref), atol=1e-6)


def test_anchor_sharded_backbone_composition(mesh, rng):
    """inter -> intra -> attention pool composed entirely under one
    shard_map, anchors staying sharded between layers: matches the
    unsharded two-layer backbone exactly."""
    B, N, C, D1, D2, nn_ = 2, 40, 6, 12, 8, 10
    anchors = jnp.asarray(so3g.get_anchors(A))
    kernels = jnp.asarray(spherical_kernel_points(0.4 * 0.7, 1))
    trace = jnp.asarray(so3g.TRACE_IDX)
    ks, K = kernels.shape[0], trace.shape[1]
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)
    feats = jnp.asarray(rng.randn(B, N, A, C).astype(np.float32))
    W1 = jnp.asarray(rng.randn(ks, C, D1).astype(np.float32) * 0.1)
    W2 = jnp.asarray(rng.randn(K, D1, D2).astype(np.float32) * 0.1)
    idx = ball_query(xyz, xyz, 0.4, nn_)
    gx = jnp.take_along_axis(
        xyz[:, None].repeat(N, 1), idx[..., None], axis=2
    ) - xyz[:, :, None]

    # unsharded reference: inter -> relu -> intra -> mean over N -> attn pool
    w = inter_kernel_weights(gx, anchors, kernels, 0.16)
    h1 = jax.nn.relu(inter_conv_contract(group_points(feats, idx), w, W1))
    h2 = intra_conv_accumulate(h1, trace, W2)          # [B, N, A, D2]
    g = jnp.mean(h2, axis=1)                           # [B, A, D2]
    logits = jnp.sum(g, axis=-1)                       # [B, A]
    attn_ref = jax.nn.softmax(logits, axis=1)
    ref = jnp.einsum("ba,bac->bc", attn_ref, g)

    def body(f, i, gxl):
        h1 = jax.nn.relu(
            inter_conv_anchor_sharded(f, i, gxl, anchors, kernels, 0.16, W1)
        )
        h2 = intra_conv_anchor_sharded(h1, trace, W2)
        gl = jnp.mean(h2, axis=1)
        pooled, _ = anchor_attn_pool_sharded(gl, jnp.sum(gl, axis=-1))
        return pooled

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, None, ANCHOR_AXIS, None), P(), P()),
        out_specs=P(),
    )
    out = fn(feats, idx, gx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
