"""Axis-prior orbit selection tests."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from equi_articulated_pose_tpu.geom import so3
from equi_articulated_pose_tpu.models.orbit_select import (
    select_slot_orbits_axis_prior,
    update_axis_prior,
)


def test_selection_prefers_prior_consistent_axis():
    B, S, A = 2, 2, 60
    anchors = jnp.asarray(so3.ANCHORS)
    # slot rotations = the anchors themselves (no residual)
    slot_R = jnp.broadcast_to(anchors[None, None], (B, S, A, 3, 3))
    cost = jnp.ones((B, S, A))
    prior = jnp.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    w = jnp.ones((B, S)) * 0.5
    orbits, axes = select_slot_orbits_axis_prior(cost, slot_R, prior, w)
    assert orbits.shape == (B, S)
    assert axes.shape == (B, S, 3)
    # the relative rotation base^T*slot at the selected pair should have its
    # axis close to the prior for the moving slot
    rel = jnp.einsum(
        "bji,bjk->bik",
        slot_R[jnp.arange(B), 0, orbits[:, 0]],
        slot_R[jnp.arange(B), 1, orbits[:, 1]],
    )
    ax, _ = so3.matrix_to_axis_angle(rel)
    d = jnp.abs(jnp.sum(ax * prior[1], axis=-1))
    assert float(d.min()) > 0.8


def test_update_axis_prior_sign_alignment():
    prior = jnp.array([[0.0, 1.0, 0.0]])
    # all samples report the flipped axis: EMA must not cancel
    axes = jnp.tile(jnp.array([0.0, -1.0, 0.0]), (8, 1, 1))
    new = update_axis_prior(prior, axes, factor=0.5)
    np.testing.assert_allclose(np.asarray(new), [[0.0, 1.0, 0.0]], atol=1e-6)

    # rotating evidence pulls the prior toward it
    target = jnp.array([[1.0, 0.0, 0.0]])
    axes = jnp.tile(target, (8, 1, 1))
    new = update_axis_prior(prior, axes, factor=0.5)
    assert float(new[0, 0]) > 0.5
    np.testing.assert_allclose(float(jnp.linalg.norm(new[0])), 1.0, atol=1e-6)


def test_model_runs_with_axis_prior():
    from equi_articulated_pose_tpu.config import get_config
    from equi_articulated_pose_tpu.models import SlotPoseModel

    cfg = dataclasses.replace(get_config("tiny").model, slot_single_mode=False)
    model = SlotPoseModel(cfg=cfg)
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(1, cfg.input_num, 3).astype(np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(0), xyz, jax.random.PRNGKey(1))
    prior = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (cfg.nmasks, 1))
    out = model.apply(
        params,
        xyz,
        method=lambda m, x: m.forward_one_iter(x, axis_prior=prior),
    )
    assert out["selected_pair_axes"].shape == (1, cfg.nmasks, 3)
    assert np.isfinite(float(out["loss"]))
