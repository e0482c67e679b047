"""Shape/behaviour tests for out-blocks, heads, slot attention, decoders."""
import numpy as np
import jax
import jax.numpy as jnp

from equi_articulated_pose_tpu import nn as enn
from equi_articulated_pose_tpu.geom import so3
from equi_articulated_pose_tpu.nn.containers import SpherePoints


def _x(key, B=2, N=24, A=60, C=8):
    k1, k2 = jax.random.split(key)
    return SpherePoints(
        jax.random.normal(k1, (B, N, 3)) * 0.3,
        jax.random.normal(k2, (B, N, A, C)),
        None,
    )


def test_inv_out_block_shapes_and_invariance():
    x = _x(jax.random.PRNGKey(0))
    blk = enn.InvOutBlock(mlp=(16,), norm="instance")
    params = blk.init(jax.random.PRNGKey(1), x)
    inv, logits = blk.apply(params, x)
    assert inv.shape == (2, 16) and logits.shape == (2, 60)

    # rotating input by a group element (and permuting feats) leaves the
    # attention-pooled invariant feature unchanged.
    g = 11
    perm = so3.PROD_IDX[so3.INV_IDX[g]]
    Rg = jnp.asarray(so3.ANCHORS[g])
    x_r = SpherePoints(
        jnp.einsum("ij,bnj->bni", Rg, x.xyz), x.feats[:, :, perm], None
    )
    inv_r, logits_r = blk.apply(params, x_r)
    np.testing.assert_allclose(np.asarray(inv_r), np.asarray(inv), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(logits_r), np.asarray(logits[:, perm]), atol=2e-3
    )


def test_inv_out_block_mask():
    x = _x(jax.random.PRNGKey(2))
    blk = enn.InvOutBlock(mlp=(16,), norm="instance")
    params = blk.init(jax.random.PRNGKey(3), x)
    mask = jnp.ones((2, 24)).at[:, 12:].set(0.0)
    inv_m, _ = blk.apply(params, x, mask)
    # changing masked-out features must not change the output
    feats2 = x.feats.at[:, 12:].set(9.99)
    inv_m2, _ = blk.apply(params, SpherePoints(x.xyz, feats2, None), mask)
    np.testing.assert_allclose(np.asarray(inv_m2), np.asarray(inv_m), atol=1e-5)


def test_pp_out_block():
    x = _x(jax.random.PRNGKey(4))
    blk = enn.InvPPOutBlock(mlp=(16,), norm="instance")
    params = blk.init(jax.random.PRNGKey(5), x)
    pp, conf = blk.apply(params, x)
    assert pp.shape == (2, 24, 16) and conf.shape == (2, 24, 60)
    np.testing.assert_allclose(np.asarray(conf.sum(-1)), 1.0, atol=1e-5)


def test_pose_head_shapes():
    x = _x(jax.random.PRNGKey(6))
    head = enn.SO3PoseHead(
        mlp=(16,), pred_axis=True, pred_pv_points=True, norm="instance"
    )
    mask = jnp.ones((2, 24)).at[0, :5].set(0.0)
    params = head.init(jax.random.PRNGKey(7), x, mask)
    out = head.apply(params, x, mask)
    assert out["R"].shape == (2, 60, 4)
    assert out["T"].shape == (2, 60, 3)
    assert out["axis"].shape == (2, 60, 3)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out["axis"], axis=-1)), 1.0, atol=1e-5
    )


def test_prismatic_head():
    x = _x(jax.random.PRNGKey(8))
    head = enn.SO3PrismaticHead(mlp=(16,), norm="instance")
    params = head.init(jax.random.PRNGKey(9), x)
    out = head.apply(params, x)
    assert out["T"].shape == (2, 60, 3)
    # R is identity quaternion
    np.testing.assert_allclose(np.asarray(out["R"][..., 0]), 1.0)


def test_slot_attention():
    B, N, D, S = 2, 32, 24, 3
    inputs = jax.random.normal(jax.random.PRNGKey(10), (B, N, D))
    sa = enn.SlotAttention(num_slots=S, dim=D, iters=3)
    params = sa.init(jax.random.PRNGKey(11), inputs, jax.random.PRNGKey(12))
    slots, attn = sa.apply(params, inputs, jax.random.PRNGKey(13))
    assert slots.shape == (B, S, D) and attn.shape == (B, S, N)
    # attention is a distribution over slots per point (softmax axis=1)
    np.testing.assert_allclose(
        np.asarray(attn.sum(1)), np.full((B, N), 1.0 + S * 1e-8), atol=1e-4
    )
    # deterministic without rng
    s2, _ = sa.apply(params, inputs)
    s3, _ = sa.apply(params, inputs)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s3))


def test_decoders():
    x = jax.random.normal(jax.random.PRNGKey(14), (2, 32))
    dec = enn.DecoderFCWithPVP(n_features=(64, 64), output_pts=16)
    params = dec.init(jax.random.PRNGKey(15), x)
    pts, pv, cp = dec.apply(params, x)
    assert pts.shape == (2, 16, 3) and pv.shape == (2, 3) and cp.shape == (2, 3)
    assert float(pts.min()) >= 0.0 and float(pts.max()) <= 1.0

    dec2 = enn.DecoderConstantCommon(n_features=(32,), output_pts=8)
    p2 = dec2.init(jax.random.PRNGKey(16), x)
    out2 = dec2.apply(p2, x)
    assert out2.shape == (2, 8, 3)

    dec3 = enn.DecoderFCAtlas(n_features=(32,), output_pts=8)
    p3 = dec3.init(jax.random.PRNGKey(17), x)
    assert dec3.apply(p3, x).shape == (2, 8, 3)

    dec4 = enn.DecoderFCWithCuboid(n_features=(32,), output_pts=8)
    p4 = dec4.init(jax.random.PRNGKey(18), x)
    pts4, ext4, R4 = dec4.apply(p4, x)
    assert pts4.shape == (2, 8, 3) and ext4.shape == (2, 3)
    # orthonormal cuboid orientation
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bkj->bik", R4, R4)),
        np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-5)

    dec5 = enn.DecoderFCAxis(n_features=(32,))
    p5 = dec5.init(jax.random.PRNGKey(19), x)
    ax = dec5.apply(p5, x)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(ax, axis=-1)), 1.0, atol=1e-5)
