"""Cross-state canonical-consistency loss (round-3 articulation fix).

The degeneracy it targets: the per-sample decoded canonical shape can absorb
the joint motion, satisfying every chamfer term while the predicted joint
angle stays constant and the axis stays unconstrained
(scripts/diag_articulation.py; config.py canon_consist_factor docstring).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from equi_articulated_pose_tpu.config import get_config
from equi_articulated_pose_tpu.nn.losses import canon_consistency_loss
from equi_articulated_pose_tpu.parallel.mesh import make_mesh
from equi_articulated_pose_tpu.train import Trainer


def _cfg(tmp_path, factor):
    cfg = get_config("tiny")
    return cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset_type="synthetic", n_samples=4,
            npoints=cfg.model.input_num,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=2, log_freq=1, save_freq=100,
            global_rot=False,
        ),
        model=dataclasses.replace(cfg.model, canon_consist_factor=factor),
        model_dir=str(tmp_path),
    )


def test_unit_zero_when_identical_and_positive_when_not():
    rng = np.random.RandomState(0)
    out = {
        "slot_canon": jnp.asarray(rng.randn(2, 2, 16, 3)),
        "pv_points": jnp.asarray(rng.randn(2, 1, 3)),
        "central_points": jnp.asarray(rng.randn(2, 2, 3)),
    }
    z = canon_consistency_loss(out, out)
    # pairwise_sqdist computes |a|^2+|b|^2-2ab, so the self-distance is only
    # zero to float32 rounding
    assert abs(float(z)) < 1e-5
    out2 = {k: v + 0.1 for k, v in out.items()}
    assert float(canon_consistency_loss(out, out2)) > 1e-3


def test_consist_metric_small_for_identical_states(tmp_path):
    """When canon_pc IS the posed cloud, the two passes share inputs and the
    slot rng, so the decodes should agree — pinning the slot-index
    correspondence the loss relies on.  NOT exactly zero: the canon pass is
    rematerialised (jax.checkpoint, see loop.py — both forwards' residuals
    exceed HBM), and a differently-optimised subgraph produces float-level
    diffs that can flip near-tied argmax selections at init; the residual
    floor observed is ~9e-3 against O(1) decode scales."""
    cfg = _cfg(tmp_path, 1.0)
    tr = Trainer(cfg, stage=1, mesh=make_mesh(1), log_dir=str(tmp_path))
    batch = next(iter(tr.loader))
    batch = {k: jnp.asarray(np.asarray(v)[:2]) for k, v in batch.items()}
    batch["canon_pc"] = batch["pc"]
    batch["canon_label"] = batch["label"]
    tr.init_params(batch)
    loss, (metrics, _) = tr._loss_fn(
        tr.params, batch, jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(loss))
    assert float(metrics["consist"]) < 0.05


def test_training_step_runs_and_grads_flow(tmp_path):
    cfg = _cfg(tmp_path, 1.0)
    tr = Trainer(cfg, stage=1, mesh=make_mesh(1), log_dir=str(tmp_path))
    batch = next(iter(tr.loader))
    batch = {k: jnp.asarray(np.asarray(v)[:2]) for k, v in batch.items()}
    tr.init_params(batch)

    def loss_of(p):
        loss, _ = tr._loss_fn(p, batch, jax.random.PRNGKey(0))
        return loss

    g = jax.grad(loss_of)(tr.params)
    gn = sum(
        float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g)
    )
    assert np.isfinite(gn) and gn > 0.0


def test_axis_from_relpose_loss_geometry():
    """Known relative rotation: the loss is ~0 when the predicted axis
    matches the rel-rot axis and ~sin(theta) when orthogonal; zero weight
    at theta=0 regardless of the axis."""
    from equi_articulated_pose_tpu.geom.so3 import axis_angle_to_matrix
    from equi_articulated_pose_tpu.nn.losses import axis_from_relpose_loss

    ax = jnp.array([0.0, 1.0, 0.0])
    th = jnp.float32(np.pi / 6)                       # 30 deg
    Rp = axis_angle_to_matrix(ax[None, None], th[None, None])  # [1,1,3,3]
    Rc = jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3))

    good = axis_from_relpose_loss(Rp, Rc, ax[None])
    bad = axis_from_relpose_loss(Rp, Rc, jnp.array([[1.0, 0.0, 0.0]]))
    assert float(good) < 1e-5
    np.testing.assert_allclose(float(bad), float(jnp.sin(th)), rtol=1e-4)

    # theta = 0: no constraint whatever the axis
    zero = axis_from_relpose_loss(Rc, Rc, jnp.array([[1.0, 0.0, 0.0]]))
    assert float(zero) < 1e-6

    # gradient reaches the axis argument, not the pose targets
    g = jax.grad(
        lambda a: axis_from_relpose_loss(Rp, Rc, a)
    )(jnp.array([[1.0, 0.0, 0.0]]))
    assert float(jnp.abs(g).sum()) > 0.0


def test_axis_from_relpose_differential_cancels_shared_motion():
    """A shared 'global drift' rotation applied to BOTH slots must cancel in
    the base_slot-differential form: only the moving slot's joint rotation
    about +y remains, so the loss is ~0 for axis=+y even though the raw
    per-slot rel axes are blends."""
    from equi_articulated_pose_tpu.geom.so3 import axis_angle_to_matrix
    from equi_articulated_pose_tpu.nn.losses import axis_from_relpose_loss

    drift_ax = jnp.array([1.0, 0.0, 0.0])
    joint_ax = jnp.array([0.0, 1.0, 0.0])
    G = axis_angle_to_matrix(drift_ax[None], jnp.array([0.4]))[0]   # shared
    J = axis_angle_to_matrix(joint_ax[None], jnp.array([0.9]))[0]   # joint

    Rc = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
    # posed: base slot = G, moving slot = J @ G (joint on top of drift)
    Rp = jnp.stack([G, J @ G])[None]
    base = jnp.array([0])

    diff = axis_from_relpose_loss(Rp, Rc, joint_ax[None], base_slot=base)
    raw = axis_from_relpose_loss(Rp, Rc, joint_ax[None])
    assert float(diff) < 1e-5          # differential isolates the joint
    assert float(raw) > 0.05           # raw form is drift-contaminated


def test_distill_only_mode_runs_canon_pass_without_consist(tmp_path):
    """Round-4 distill-only mode: axis_from_relpose > 0 with
    canon_consist_factor == 0 still runs the canonical twin forward (for the
    relpose axis target) but adds NO consistency penalty — only the axis
    head follows the target (the measured ovengt2 failure was the
    consistency pull, RESULTS r3 item 15)."""
    cfg = _cfg(tmp_path, 0.0)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, axis_from_relpose=1.0)
    )
    tr = Trainer(cfg, stage=1, mesh=make_mesh(1), log_dir=str(tmp_path))
    batch = next(iter(tr.loader))
    batch = {k: jnp.asarray(np.asarray(v)[:2]) for k, v in batch.items()}
    tr.init_params(batch)
    loss, (metrics, _) = tr._loss_fn(tr.params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert "ax_rel" in metrics and "consist" not in metrics

    # gradient flows (into the axis head among others), and the
    # axis-from-relpose term contributes: zeroing the weight changes loss
    def loss_of(p):
        l, _ = tr._loss_fn(p, batch, jax.random.PRNGKey(3))
        return l

    g = jax.grad(loss_of)(tr.params)
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0.0

    tr0 = Trainer(
        _cfg(tmp_path, 0.0), stage=1, mesh=make_mesh(1), log_dir=str(tmp_path)
    )
    tr0.params = tr.params
    l0, (m0, _) = tr0._loss_fn(tr.params, batch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        float(loss) - float(metrics["ax_rel"]), float(l0), rtol=1e-4
    )
