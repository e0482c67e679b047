"""Baseline networks (DGCNN, PointNet++) and loss functions."""
import numpy as np
import jax
import jax.numpy as jnp

from equi_articulated_pose_tpu.models.baselines import DGCNNSeg, PointNet2Seg
from equi_articulated_pose_tpu.nn.losses import (
    attention_cross_entropy,
    cross_entropy,
    multitask_detection_loss,
    purity_loss,
)
from equi_articulated_pose_tpu.geom import so3


def test_dgcnn_seg(rng):
    xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    net = DGCNNSeg(num_classes=3, k=8)
    params = net.init(jax.random.PRNGKey(0), xyz)
    out = net.apply(params, xyz)
    assert out.shape == (2, 64, 3)
    g = jax.grad(lambda p: net.apply(p, xyz).sum())(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_pointnet2_seg(rng):
    xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    net = PointNet2Seg(num_classes=4)
    params = net.init(jax.random.PRNGKey(1), xyz)
    out = net.apply(params, xyz)
    assert out.shape == (2, 64, 4)


def test_cross_entropy_and_purity(rng):
    logits = jnp.asarray(rng.randn(4, 10, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (4, 10)))
    loss, acc = cross_entropy(logits, labels)
    assert np.isfinite(float(loss)) and 0 <= float(acc) <= 1
    # perfect logits -> ~0 loss, acc 1
    perfect = jax.nn.one_hot(labels, 3) * 50.0
    loss_p, acc_p = cross_entropy(perfect, labels)
    assert float(loss_p) < 1e-3 and float(acc_p) == 1.0

    attn = jnp.asarray(np.abs(rng.randn(2, 3, 10)).astype(np.float32))
    pl = purity_loss(attn)
    assert np.isfinite(float(pl)) and float(pl) >= 0
    hard = jax.nn.one_hot(labels[:2], 3).transpose(0, 2, 1)
    assert float(purity_loss(hard)) < 1e-3


def test_ov_max_percent_loss():
    from equi_articulated_pose_tpu.nn.losses import ov_max_percent_loss

    # uniform occupancy -> zero penalty
    uni = jnp.ones((2, 3, 12)) / 3.0
    assert float(ov_max_percent_loss(uni)) < 1e-6
    # unequal but non-starving split (60/25/15 with tau=1/9) -> still zero
    p = np.zeros((1, 3, 20), np.float32)
    p[0, 0, :12] = 1.0; p[0, 1, 12:17] = 1.0; p[0, 2, 17:] = 1.0
    assert float(ov_max_percent_loss(jnp.asarray(p))) < 1e-6
    # full collapse (every point on slot 0) -> 2 starving slots
    coll = jnp.zeros((2, 3, 12)).at[:, 0].set(1.0)
    np.testing.assert_allclose(float(ov_max_percent_loss(coll)), 2.0, atol=1e-5)
    # gradient raises starving slots' attention (negative wrt their attn)
    g = jax.grad(lambda a: ov_max_percent_loss(a))(coll + 0.1)
    assert float(g[:, 1:].sum()) < 0.0


def test_attention_ce_modes(rng):
    cls_logits = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    cls_labels = jnp.asarray(rng.randint(0, 5, (4,)))
    a_logits = jnp.asarray(rng.randn(4, 60).astype(np.float32))
    a_labels = jnp.asarray(rng.randint(0, 60, (4,)))
    for lt in ("default", "no_reg", "schedule"):
        loss, cl, rl, acc, racc = attention_cross_entropy(
            cls_logits, cls_labels, a_logits, a_labels,
            loss_type=lt, step=jnp.asarray(100),
        )
        assert np.isfinite(float(loss))


def test_multitask_detection_loss(rng):
    anchors = jnp.asarray(so3.ANCHORS)
    B = 4
    gt_label = jnp.asarray(rng.randint(0, 60, (B,)))
    gt_R = anchors[gt_label]
    logits = jax.nn.one_hot(gt_label, 60) * 10.0
    # residual = identity quaternion at every anchor
    raw = jnp.zeros((B, 60, 4)).at[..., 0].set(1.0)
    loss, cl, reg, ang = multitask_detection_loss(
        logits, raw, gt_R, gt_label, anchors
    )
    assert float(reg) < 1e-6
    assert float(ang) < 0.5


def test_primitive_net_heads(rng):
    from equi_articulated_pose_tpu.models.baselines import (
        PrimitiveNet,
        segment_from_embedding,
    )

    xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    net = PrimitiveNet(emb_size=16, k=8)
    params = net.init(jax.random.PRNGKey(3), xyz)
    emb, type_pp, normal = net.apply(params, xyz)
    assert emb.shape == (2, 64, 16)
    assert type_pp.shape == (2, 64, 8)
    # log-softmax normalisation
    np.testing.assert_allclose(
        np.asarray(jnp.exp(type_pp).sum(-1)), 1.0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(normal, axis=-1)), 1.0, atol=1e-4
    )
    labels = segment_from_embedding(emb, n_parts=2)
    assert labels.shape == (2, 64)
    assert set(np.unique(np.asarray(labels))) <= {0, 1}


def test_pointnetpp_features(rng):
    from equi_articulated_pose_tpu.models.baselines import PointnetPP

    xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    net = PointnetPP()
    params = net.init(jax.random.PRNGKey(4), xyz)
    feats = net.apply(params, xyz)
    assert feats.shape == (2, 128, 128)
    assert np.isfinite(np.asarray(feats)).all()
