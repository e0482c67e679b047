"""Cross-category integration: every preset family builds, trains a step, and
evaluates (tiny shapes, CPU) — the driver's config ladder in miniature."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from equi_articulated_pose_tpu.config import get_config
from equi_articulated_pose_tpu.data import DataLoader, build_dataset
from equi_articulated_pose_tpu.eval import Evaluator
from equi_articulated_pose_tpu.models import SlotPoseModel


def _tiny_for(shape_type, nmasks, joint_type):
    cfg = get_config("tiny")
    return cfg.replace(
        model=dataclasses.replace(
            cfg.model, shape_type=shape_type, nmasks=nmasks, joint_type=joint_type
        ),
        data=dataclasses.replace(
            cfg.data,
            dataset_type="synthetic",
            shape_type=shape_type,
            n_samples=2,
            npoints=cfg.model.input_num,
        ),
        train=dataclasses.replace(cfg.train, batch_size=2),
    )


@pytest.mark.parametrize(
    "shape_type,nmasks,joint_type",
    [
        ("eyeglasses", 3, "revolute"),   # use_equi=35 family
        ("drawer", 4, "prismatic"),      # use_equi=39 family
        ("safe", 2, "revolute"),         # use_equi=38 family
    ],
)
def test_category_forward_and_eval(shape_type, nmasks, joint_type):
    cfg = _tiny_for(shape_type, nmasks, joint_type)
    model = SlotPoseModel(cfg=cfg.model)
    ds = build_dataset(cfg.data, split="test", n_shapes=1)
    item = ds[0]
    assert item["pose_segs"].shape[0] == nmasks or shape_type == "safe"

    xyz = jnp.asarray(item["pc"][None])
    params = model.init(jax.random.PRNGKey(0), xyz, jax.random.PRNGKey(1))
    loss, out = model.apply(params, xyz, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert out["pred_R"].shape == (1, nmasks, 3, 3)

    ev = Evaluator(cfg, model, params)
    loader = DataLoader(ds, 2, shuffle=False, prefetch=0)
    metrics = ev.evaluate(loader, None, max_batches=1)
    assert np.isfinite(metrics["seg_iou"]) and np.isfinite(
        metrics["rot_err_deg_part0_mean"]
    )
