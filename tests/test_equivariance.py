"""SO(3) equivariance property tests — formalisation of the reference's
commented-out probes (``vgtk/vgtk/so3conv/functional.py:733-754``,
``modules.py:295-318``; SURVEY.md §4(b)).

Rotating the input point cloud by a group element g must permute the anchor
axis of every equivariant feature map by π_g(a) = idx(R_g^T R_a), leaving
values unchanged (up to float error).
"""
import numpy as np
import jax
import jax.numpy as jnp

from equi_articulated_pose_tpu.geom import so3
from equi_articulated_pose_tpu.nn.blocks import ConvBlockSpec, SO3Backbone
from equi_articulated_pose_tpu.nn.containers import SpherePoints, occupancy_features
from equi_articulated_pose_tpu.nn.so3conv import (
    InterSO3Conv,
    IntraSO3Conv,
    inter_kernel_weights,
    intra_group_gather,
)


def perm_for(g: int) -> np.ndarray:
    """π_g(a) = idx(R_g^T R_a)."""
    return so3.PROD_IDX[so3.INV_IDX[g]]


def _cloud(key, n=48):
    return jax.random.normal(key, (1, n, 3)) * 0.3 + jnp.array([0.2, 0.1, -0.1])


def test_kernel_weights_equivariance():
    key = jax.random.PRNGKey(0)
    gx = jax.random.normal(key, (1, 8, 16, 3)) * 0.1
    anchors = jnp.asarray(so3.ANCHORS)
    from equi_articulated_pose_tpu.geom.kernels import spherical_kernel_points

    kernels = jnp.asarray(spherical_kernel_points(0.1, 1))
    w = inter_kernel_weights(gx, anchors, kernels, sigma=0.02)
    g = 17
    Rg = jnp.asarray(so3.ANCHORS[g])
    w_rot = inter_kernel_weights(
        jnp.einsum("ij,bmnj->bmni", Rg, gx), anchors, kernels, sigma=0.02
    )
    perm = perm_for(g)
    np.testing.assert_allclose(
        np.asarray(w_rot), np.asarray(w[:, :, perm]), atol=2e-4
    )


def test_inter_conv_equivariance():
    key = jax.random.PRNGKey(1)
    xyz = _cloud(key)
    x = SpherePoints(xyz, occupancy_features(xyz, 60), None)
    conv = InterSO3Conv(
        dim_out=8, kernel_size=1, stride=1, radius=0.4, sigma=0.08, n_neighbor=16
    )
    params = conv.init(jax.random.PRNGKey(2), x)
    out = conv.apply(params, x)

    g = 23
    Rg = jnp.asarray(so3.ANCHORS[g])
    xyz_r = jnp.einsum("ij,bnj->bni", Rg, xyz)
    out_r = conv.apply(params, SpherePoints(xyz_r, x.feats, None))

    perm = perm_for(g)
    np.testing.assert_allclose(
        np.asarray(out_r.feats), np.asarray(out.feats[:, :, perm]), atol=2e-3
    )
    # and the centre positions rotate
    np.testing.assert_allclose(
        np.asarray(out_r.xyz), np.asarray(jnp.einsum("ij,bnj->bni", Rg, out.xyz)), atol=1e-5
    )


def test_intra_gather_equivariance():
    key = jax.random.PRNGKey(3)
    f = jax.random.normal(key, (1, 5, 60, 4))
    tr = jnp.asarray(so3.TRACE_IDX)
    g = 41
    perm = perm_for(g)
    lhs = intra_group_gather(f[:, :, perm], tr)
    rhs = intra_group_gather(f, tr)[:, :, perm]
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)


def test_backbone_equivariance_two_blocks():
    key = jax.random.PRNGKey(4)
    xyz = _cloud(key, n=40)
    x = SpherePoints(xyz, occupancy_features(xyz, 60), None)
    specs = [
        ConvBlockSpec(
            block_type="separable_block",
            dim_out=8,
            kernel_size=1,
            stride=1,
            radius=0.4,
            sigma=0.08,
            n_neighbor=16,
            norm="instance",
            use_pose=False,
        ),
        ConvBlockSpec(
            block_type="separable_block",
            dim_out=12,
            kernel_size=1,
            stride=1,
            radius=0.5,
            sigma=0.12,
            n_neighbor=16,
            norm="instance",
            use_pose=False,
        ),
    ]
    net = SO3Backbone(specs=specs)
    params = net.init(jax.random.PRNGKey(5), x)
    out = net.apply(params, x)

    g = 7
    Rg = jnp.asarray(so3.ANCHORS[g])
    out_r = net.apply(
        params, SpherePoints(jnp.einsum("ij,bnj->bni", Rg, xyz), x.feats, None)
    )
    perm = perm_for(g)
    scale = float(jnp.abs(out.feats).max())
    np.testing.assert_allclose(
        np.asarray(out_r.feats) / scale,
        np.asarray(out.feats[:, :, perm]) / scale,
        atol=5e-3,
    )


def test_pose_conv_identity_pose_matches_plain():
    """With identity pose the pose-conv anchor permutation must be identity
    (the shipped reference configs run exactly this regime; ref
    ``unsup_..._40:3341-3344``)."""
    key = jax.random.PRNGKey(6)
    xyz = _cloud(key, n=32)
    feats = jax.random.normal(jax.random.PRNGKey(7), (1, 32, 60, 6))
    pose = jnp.broadcast_to(jnp.eye(4), (1, 32, 4, 4))
    conv = InterSO3Conv(
        dim_out=8, kernel_size=1, stride=1, radius=0.4, sigma=0.08, n_neighbor=16,
        use_pose=True, permute_modes=1,
    )
    x_pose = SpherePoints(xyz, feats, pose)
    params = conv.init(jax.random.PRNGKey(8), x_pose)
    out_pose = conv.apply(params, x_pose)

    conv_plain = InterSO3Conv(
        dim_out=8, kernel_size=1, stride=1, radius=0.4, sigma=0.08, n_neighbor=16,
        use_pose=False,
    )
    out_plain = conv_plain.apply(params, SpherePoints(xyz, feats, None))
    np.testing.assert_allclose(
        np.asarray(out_pose.feats), np.asarray(out_plain.feats), atol=1e-5
    )


def test_pose_conv_global_consistency():
    """Rotating (xyz, anchor-permuted feats, pose) globally by a group element
    permutes the output anchors — pose-conv must agree with the plain conv's
    equivariance law when the pose field is globally consistent."""
    key = jax.random.PRNGKey(9)
    xyz = _cloud(key, n=32)
    feats = jax.random.normal(jax.random.PRNGKey(10), (1, 32, 60, 6))
    g = 13
    Rg = so3.ANCHORS[g]
    perm = perm_for(g)
    pose = np.tile(np.eye(4, dtype=np.float32), (1, 32, 1, 1))
    pose_r = pose.copy()
    pose_r[..., :3, :3] = Rg

    conv = InterSO3Conv(
        dim_out=8, kernel_size=1, stride=1, radius=0.4, sigma=0.08, n_neighbor=16,
        use_pose=True, permute_modes=1,
    )
    x = SpherePoints(xyz, feats, jnp.asarray(pose))
    params = conv.init(jax.random.PRNGKey(11), x)
    out = conv.apply(params, x)

    xyz_r = jnp.einsum("ij,bnj->bni", jnp.asarray(Rg), xyz)
    out_r = conv.apply(
        params, SpherePoints(xyz_r, feats[:, :, perm], jnp.asarray(pose_r))
    )
    np.testing.assert_allclose(
        np.asarray(out_r.feats), np.asarray(out.feats[:, :, perm]), atol=2e-3
    )


def test_pose_conv_part_level_equivariance():
    """The paper's core claim, as a unit test: two well-separated parts; part B
    moves rigidly (group rotation + translation) with its pose updated.  Then
    (a) part-A features are unchanged, (b) part-B features are the static
    part-B features permuted by the motion's anchor permutation."""
    rng = np.random.RandomState(0)
    nA, nB = 24, 24
    ptsA = (rng.randn(nA, 3) * 0.15).astype(np.float32)
    ptsB = (rng.randn(nB, 3) * 0.15 + np.array([3.0, 0.0, 0.0])).astype(np.float32)
    xyz = jnp.asarray(np.concatenate([ptsA, ptsB])[None])
    feats = occupancy_features(xyz, 60)

    g = 29
    Rg = so3.ANCHORS[g]
    t = np.array([0.0, 2.0, 1.0], dtype=np.float32)
    ptsB_moved = ptsB @ Rg.T + t
    xyz_moved = jnp.asarray(np.concatenate([ptsA, ptsB_moved])[None])

    pose_static = np.tile(np.eye(4, dtype=np.float32), (1, nA + nB, 1, 1))
    pose_moved = pose_static.copy()
    pose_moved[0, nA:, :3, :3] = Rg
    pose_moved[0, nA:, :3, 3] = t

    conv = InterSO3Conv(
        dim_out=8, kernel_size=1, stride=1, radius=0.5, sigma=0.125, n_neighbor=16,
        use_pose=True, permute_modes=1,
    )
    x0 = SpherePoints(xyz, feats, jnp.asarray(pose_static))
    params = conv.init(jax.random.PRNGKey(12), x0)
    out0 = conv.apply(params, x0)
    out1 = conv.apply(params, SpherePoints(xyz_moved, feats, jnp.asarray(pose_moved)))

    # (a) static part A unchanged
    np.testing.assert_allclose(
        np.asarray(out1.feats[:, :nA]), np.asarray(out0.feats[:, :nA]), atol=2e-3
    )
    # (b) moved part B = anchor-permuted static part B
    perm = perm_for(g)
    np.testing.assert_allclose(
        np.asarray(out1.feats[:, nA:]),
        np.asarray(out0.feats[:, nA:, perm]),
        atol=2e-3,
    )
