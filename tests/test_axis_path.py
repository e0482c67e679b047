"""Round-2 feature tests: the model-38 angle path (axis gradient, pivot-
derived translations), sel_mode_trans anchor restriction, cuboid priors,
axis_reg_stra running state, plateau/step LR schedules, loader tail."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from equi_articulated_pose_tpu.config import get_config
from equi_articulated_pose_tpu.models import SlotPoseModel


def _tiny(**kw):
    return dataclasses.replace(get_config("tiny").model, **kw)


def _init(model, cfg, B=2, seed=0):
    rng = np.random.RandomState(seed)
    xyz = jnp.asarray(rng.randn(B, cfg.input_num, 3).astype(np.float32) * 0.3)
    params = model.init(jax.random.PRNGKey(0), xyz, jax.random.PRNGKey(1))
    return params, xyz


def _grads(model, params, xyz):
    def lf(p):
        (l, _), _ = model.apply(
            p, xyz, jax.random.PRNGKey(2), mutable=["batch_stats", "state"]
        )
        return l

    g = jax.grad(lf)(params)["params"]
    return {
        "/".join(str(k.key) for k in path): v
        for path, v in jax.tree_util.tree_leaves_with_path(g)
    }


def test_angle_path_axis_head_gets_gradient():
    """The round-1 bug: with representation='quat' the axis head had zero
    gradient.  The angle path must train it (ref unsup_..._38:1096-1112)."""
    cfg = _tiny(representation="angle")
    model = SlotPoseModel(cfg=cfg)
    params, xyz = _init(model, cfg)
    flat = _grads(model, params, xyz)
    ax = {k: float(jnp.abs(v).max()) for k, v in flat.items() if "axis_reg" in k}
    assert ax and all(v > 0 for v in ax.values()), ax


def test_angle_path_pivot_gets_gradient():
    """Pivot-derived translations + pivot losses must train the pair
    decoder's pivot branch."""
    cfg = _tiny(representation="angle")
    model = SlotPoseModel(cfg=cfg)
    params, xyz = _init(model, cfg)
    flat = _grads(model, params, xyz)
    pv = {
        k: float(jnp.abs(v).max())
        for k, v in flat.items()
        if "pair_slot_decoder" in k and "pv_mlp" in k
    }
    assert pv and any(v > 0 for v in pv.values()), pv


def test_quat_path_still_works():
    cfg = get_config("tiny_quat").model
    assert cfg.representation == "quat"
    model = SlotPoseModel(cfg=cfg)
    params, xyz = _init(model, cfg)
    (loss, out), _ = model.apply(
        params, xyz, jax.random.PRNGKey(2), mutable=["batch_stats", "state"]
    )
    assert np.isfinite(float(loss))


def test_sel_mode_trans_fixes_orbit():
    cfg = _tiny(sel_mode_trans=18)
    model = SlotPoseModel(cfg=cfg)
    params, xyz = _init(model, cfg)
    (loss, out), _ = model.apply(
        params, xyz, jax.random.PRNGKey(2), mutable=["batch_stats", "state"]
    )
    assert np.isfinite(float(loss))
    np.testing.assert_array_equal(np.asarray(out["slot_orbits"]), 18)
    # selected anchor matches anchor 18
    from equi_articulated_pose_tpu.geom import so3

    np.testing.assert_allclose(
        np.asarray(out["selected_anchors"][0, 0]),
        np.asarray(so3.get_anchors(60)[18]),
        atol=1e-5,
    )


def test_cuboid_priors_train():
    for rp in (5, 7):
        cfg = _tiny(recon_prior=rp)
        model = SlotPoseModel(cfg=cfg)
        params, xyz = _init(model, cfg)
        flat = _grads(model, params, xyz)
        cub = {k: float(jnp.abs(v).max()) for k, v in flat.items() if "cuboid" in k}
        assert cub and all(np.isfinite(v) for v in cub.values())
        assert any(v > 0 for v in cub.values()), (rp, cub)


def test_axis_reg_stra_state_updates():
    cfg = _tiny(axis_reg_stra=1)
    model = SlotPoseModel(cfg=cfg)
    params, xyz = _init(model, cfg)
    assert "state" in params
    (_, _), mstate = model.apply(
        params, xyz, jax.random.PRNGKey(2), mutable=["batch_stats", "state"]
    )
    st = mstate["state"]
    assert float(st["pv_count"]) > 0
    assert np.isfinite(float(st["avg_pv_dist"]))
    # eval mode (no mutable state) still runs using the stored stats
    (loss, _), _ = model.apply(params, xyz, None, mutable=["batch_stats"])
    assert np.isfinite(float(loss))


def test_with_part_proposal_off_runs():
    cfg = _tiny(with_part_proposal=False)
    model = SlotPoseModel(cfg=cfg)
    params, xyz = _init(model, cfg)
    (loss, _), _ = model.apply(
        params, xyz, jax.random.PRNGKey(2), mutable=["batch_stats", "state"]
    )
    assert np.isfinite(float(loss))


def test_step_and_plateau_schedules():
    from equi_articulated_pose_tpu.train.schedule import (
        PlateauState,
        make_schedule,
    )

    s = make_schedule(1e-4, "step", 0.7, 1000)
    np.testing.assert_allclose(float(s(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(999)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(1000)), 0.7e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(2500)), 0.49e-4, rtol=1e-6)

    p = PlateauState(1e-3, 0.5, patience=3)
    for loss in (1.0, 0.9, 0.8):
        assert p.update(loss) == 1e-3
    # 3 non-improving steps -> decay
    p.update(0.9), p.update(0.9)
    assert p.update(0.9) == 0.5e-3


def test_loader_tail_not_dropped():
    from equi_articulated_pose_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return {"x": np.full((2,), i, dtype=np.float32)}

    dl = DataLoader(DS(), 3, shuffle=False, drop_last=False, prefetch=0)
    batches = list(dl)
    assert len(batches) == len(dl) == 3
    # the tail batch exists and is padded to the full batch size
    assert batches[-1]["x"].shape == (3, 2)
    seen = {int(b["x"][i, 0]) for b in batches for i in range(3)}
    assert seen == set(range(7))


def test_partial_view_deterministic_across_processes():
    """Camera seeding must not depend on PYTHONHASHSEED (ADVICE r1)."""
    import subprocess
    import sys

    code = (
        "import numpy as np;"
        "from equi_articulated_pose_tpu.data.partial import PartialSyntheticDataset;"
        "ds = PartialSyntheticDataset(shape_type='oven', npoints=64, n_samples=2);"
        "print(float(np.abs(ds[0]['pc']).sum()))"
    )
    outs = set()
    for seed in ("0", "1234"):
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin:/usr/local/bin",
                 "JAX_PLATFORMS": "cpu"},
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs.add(r.stdout.strip())
    assert len(outs) == 1, outs


def test_mtx_based_axis_regression():
    """Spherical-cap axis parameterisation (eyeglasses recipe): unit axes
    within 45 deg of +y (ref model_utils.py:593-630)."""
    cfg = _tiny(mtx_based_axis_regression=True, representation="angle")
    model = SlotPoseModel(cfg=cfg)
    params, xyz = _init(model, cfg)
    (loss, out), _ = model.apply(
        params, xyz, jax.random.PRNGKey(2), mutable=["batch_stats", "state"]
    )
    assert np.isfinite(float(loss))
    ax = np.asarray(out["real_defined_axis"])
    np.testing.assert_allclose(np.linalg.norm(ax, axis=-1), 1.0, atol=1e-4)
