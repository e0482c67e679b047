"""End-to-end forward/backward smoke tests for stage-0 and stage-1 models
(tiny shapes, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equi_articulated_pose_tpu.config import get_config
from equi_articulated_pose_tpu.models import GlobalAlignModel, SlotPoseModel


CFG = get_config("tiny").model


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.RandomState(0)
    pts = rng.randn(2, CFG.input_num, 3).astype(np.float32) * 0.3
    return jnp.asarray(pts)


def test_stage0_forward_backward(cloud):
    model = GlobalAlignModel(cfg=CFG)
    params = model.init(jax.random.PRNGKey(0), cloud)
    out = model.apply(params, cloud)
    assert out["glb_R"].shape == (2, 3, 3)
    assert out["glb_T"].shape == (2, 3)
    assert out["inv_pts"].shape == cloud.shape
    assert np.isfinite(float(out["loss"]))

    # R is a rotation
    RtR = jnp.einsum("bij,bkj->bik", out["glb_R"], out["glb_R"])
    np.testing.assert_allclose(np.asarray(RtR), np.tile(np.eye(3), (2, 1, 1)), atol=1e-4)

    def loss_fn(p):
        return model.apply(p, cloud)["loss"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_stage1_forward_backward(cloud):
    model = SlotPoseModel(cfg=CFG)
    params = model.init(jax.random.PRNGKey(1), cloud, jax.random.PRNGKey(2))
    loss, out = model.apply(params, cloud, jax.random.PRNGKey(3))
    S, M, N = CFG.nmasks, CFG.part_pred_npoints, CFG.input_num
    assert np.isfinite(float(loss))
    assert out["pred_R"].shape == (2, S, 3, 3)
    assert out["pred_T"].shape == (2, S, 3)
    assert out["attn"].shape == (2, S, N)
    assert out["hard_labels"].shape == (2, N)
    assert out["transformed_pts"].shape == (2, S, M, 3)
    assert out["real_defined_axis"].shape == (2, 3)
    assert out["x_next"].shape == (S, 2, N, 3)
    # pred_R are valid rotations
    RtR = jnp.einsum("bsij,bskj->bsik", out["pred_R"], out["pred_R"])
    np.testing.assert_allclose(
        np.asarray(RtR), np.tile(np.eye(3), (2, S, 1, 1)), atol=1e-4
    )

    def loss_fn(p):
        l, _ = model.apply(p, cloud, jax.random.PRNGKey(3))
        return l

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_stage1_prismatic(cloud):
    import dataclasses

    cfg = dataclasses.replace(CFG, joint_type="prismatic", nmasks=3)
    model = SlotPoseModel(cfg=cfg)
    params = model.init(jax.random.PRNGKey(4), cloud, jax.random.PRNGKey(5))
    loss, out = model.apply(params, cloud, jax.random.PRNGKey(6))
    assert np.isfinite(float(loss))
    # prismatic: every slot rotation is an anchor rotation (identity part-R)
    assert out["pred_R"].shape == (2, 3, 3, 3)


def test_stage1_multi_iter(cloud):
    import dataclasses

    cfg = dataclasses.replace(CFG, num_iters=2)
    model = SlotPoseModel(cfg=cfg)
    params = model.init(jax.random.PRNGKey(7), cloud, jax.random.PRNGKey(8))
    loss, out = model.apply(params, cloud, jax.random.PRNGKey(9))
    assert np.isfinite(float(loss))


def test_stage1_angle_representation(cloud):
    import dataclasses

    cfg = dataclasses.replace(CFG, representation="angle", pred_axis=True)
    model = SlotPoseModel(cfg=cfg)
    params = model.init(jax.random.PRNGKey(20), cloud, jax.random.PRNGKey(21))
    loss, out = model.apply(params, cloud, jax.random.PRNGKey(22))
    assert np.isfinite(float(loss))
    RtR = jnp.einsum("bsij,bskj->bsik", out["pred_R"], out["pred_R"])
    np.testing.assert_allclose(
        np.asarray(RtR), np.tile(np.eye(3), (2, CFG.nmasks, 1, 1)), atol=1e-4
    )


def test_stage1_use_2d(cloud):
    import dataclasses

    cfg = dataclasses.replace(CFG, use_2d=True, joint_type="prismatic", nmasks=3)
    model = SlotPoseModel(cfg=cfg)
    params = model.init(jax.random.PRNGKey(30), cloud, jax.random.PRNGKey(31))
    loss, out = model.apply(params, cloud, jax.random.PRNGKey(32))
    assert np.isfinite(float(loss))
    # orbit index ranges over the 240 product anchors
    assert int(out["slot_orbits"].max()) < 240


def test_stage1_art_mode(cloud):
    import dataclasses

    cfg = dataclasses.replace(CFG, use_art_mode=True, num_iters=2)
    model = SlotPoseModel(cfg=cfg)
    params = model.init(jax.random.PRNGKey(40), cloud, jax.random.PRNGKey(41))
    loss, out = model.apply(params, cloud, jax.random.PRNGKey(42))
    assert np.isfinite(float(loss))


def test_stage0_loss_invariant_under_group_rotation(cloud):
    """The stage-0 min-over-orbit chamfer loss must be invariant when the
    input is rotated by a group element (the pipeline's core equivariance
    property, end-to-end through backbone + head + orbit selection)."""
    from equi_articulated_pose_tpu.geom import so3

    model = GlobalAlignModel(cfg=CFG)
    params = model.init(jax.random.PRNGKey(50), cloud)
    out = model.apply(params, cloud)

    g = 37
    Rg = jnp.asarray(so3.ANCHORS[g])
    rotated = jnp.einsum("ij,bnj->bni", Rg, cloud)
    out_r = model.apply(params, rotated)
    np.testing.assert_allclose(
        np.asarray(out_r["per_sample_loss"]),
        np.asarray(out["per_sample_loss"]),
        rtol=2e-2, atol=1e-4,
    )
    # and the selected global rotation co-rotates: R' ≈ Rg @ R
    want = jnp.einsum("ij,bjk->bik", Rg, out["glb_R"])
    np.testing.assert_allclose(
        np.asarray(out_r["glb_R"]), np.asarray(want), atol=5e-2
    )
