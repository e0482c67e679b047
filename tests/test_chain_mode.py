"""Chain pose modeling for >=3 revolute slots (the eyeglasses family).

Mirrors ``unsup_..._35:846-895``: middle slot is the chain base (identity
residual rotation, translation = its central point), outer slots rotate about
the shared predicted axis (negated below the base) and translate about their
own pair pivot; per-joint pivot losses tie each pair pivot to both adjacent
parts (``_35:1145-1224``).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from equi_articulated_pose_tpu.config import get_config
from equi_articulated_pose_tpu.models import SlotPoseModel


def _setup(nmasks=3, **kw):
    cfg = get_config("tiny").model
    cfg = dataclasses.replace(cfg, nmasks=nmasks, representation="angle", **kw)
    model = SlotPoseModel(cfg=cfg)
    xyz = jnp.asarray(
        np.random.RandomState(0).randn(2, cfg.input_num, 3).astype(np.float32) * 0.3
    )
    params = model.init(jax.random.PRNGKey(0), xyz, jax.random.PRNGKey(1))
    return model, params, xyz


def test_chain_mode_active_for_3_slots():
    model, params, xyz = _setup()
    assert model.chain_mode
    (loss, out), _ = model.apply(
        params, xyz, jax.random.PRNGKey(2), mutable=["batch_stats"]
    )
    assert np.isfinite(float(loss))
    # one pivot per joint, not per slot
    assert out["pv_points"].shape == (2, 2, 3)


def test_chain_base_slot_identity_residual():
    """The middle slot's full rotation must equal its selected anchor — the
    residual is forced to the identity (ref _35:858-860)."""
    model, params, xyz = _setup()
    (_, out), _ = model.apply(
        params, xyz, jax.random.PRNGKey(2), mutable=["batch_stats"]
    )
    pr = np.asarray(out["pred_R"])          # [B, S, 3, 3]
    sa = np.asarray(out["selected_anchors"])
    np.testing.assert_allclose(pr[:, 1], sa[:, 1], atol=1e-5)
    # outer slots carry a non-identity residual in general
    assert not np.allclose(pr[:, 0], sa[:, 0], atol=1e-3)


def test_chain_axis_head_receives_gradient():
    model, params, xyz = _setup()

    def loss_fn(p):
        (l, _), _ = model.apply(
            {**params, "params": p}, xyz, jax.random.PRNGKey(2),
            mutable=["batch_stats"],
        )
        return l

    g = jax.grad(loss_fn)(params["params"])
    import jax.tree_util as jtu

    flat = {jtu.keystr(k): v for k, v in jtu.tree_flatten_with_path(g)[0]}
    ax = [v for k, v in flat.items() if "axis_reg" in k]
    assert ax and any(float(jnp.abs(v).max()) > 0 for v in ax)


def test_two_slot_models_unaffected():
    model, params, xyz = _setup(nmasks=2)
    assert not model.chain_mode
    (loss, out), _ = model.apply(
        params, xyz, jax.random.PRNGKey(2), mutable=["batch_stats"]
    )
    assert np.isfinite(float(loss))
    assert out["pv_points"].shape == (2, 2, 3)  # S pair blocks for S=2
