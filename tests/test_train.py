"""End-to-end training-loop smoke tests (tiny synthetic data, CPU mesh)."""
import dataclasses
import os

import numpy as np
import jax
import pytest

from equi_articulated_pose_tpu.config import get_config
from equi_articulated_pose_tpu.parallel.mesh import make_mesh
from equi_articulated_pose_tpu.train import Trainer
from equi_articulated_pose_tpu.train.checkpoint import (
    load_checkpoint,
    safe_load_common,
    save_checkpoint,
)


def _cfg(tmp_path, stage):
    cfg = get_config("tiny")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset_type="synthetic", n_samples=4, npoints=cfg.model.input_num
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=4, log_freq=1, save_freq=100, global_rot=False
        ),
        model_dir=str(tmp_path),
    )
    return cfg


def test_stage0_training_runs(tmp_path):
    cfg = _cfg(tmp_path, 0)
    tr = Trainer(cfg, stage=0, mesh=make_mesh(2), log_dir=str(tmp_path))
    params = tr.train(num_steps=2)
    assert params is not None


def test_stage1_training_with_frozen_glb(tmp_path):
    cfg = _cfg(tmp_path, 1)
    mesh = make_mesh(2)
    # quick stage-0 params
    tr0 = Trainer(cfg, stage=0, mesh=mesh, log_dir=str(tmp_path))
    p0 = tr0.train(num_steps=1)
    ckpt = os.path.join(str(tmp_path), "glb.msgpack")
    save_checkpoint(ckpt, jax.device_get(p0))

    cfg1 = cfg.replace(train=dataclasses.replace(cfg.train, global_rot=True))
    tr1 = Trainer(cfg1, stage=1, mesh=mesh, log_dir=str(tmp_path))
    tr1.load_glb(ckpt)
    params = tr1.train(num_steps=2)
    assert params is not None
    assert "iou" in dict(tr1.summary.items())


def test_load_glb_accepts_full_train_state(tmp_path):
    """Resumable ladders harvest periodic full-train-state checkpoints when a
    stage-0 run is deadline-cut; ``--resume-glb`` must unwrap them (regression:
    the round-5 partlap stage-1 arm failed with 0/92 leaves restored)."""
    from equi_articulated_pose_tpu.train.checkpoint import save_train_state

    cfg = _cfg(tmp_path, 0)
    mesh = make_mesh(2)
    tr0 = Trainer(cfg, stage=0, mesh=mesh, log_dir=str(tmp_path))
    p0 = tr0.train(num_steps=1)
    path = os.path.join(str(tmp_path), "glb_state.msgpack")
    save_train_state(path, jax.device_get(p0), jax.device_get(tr0.opt_state), 1)

    cfg1 = cfg.replace(train=dataclasses.replace(cfg.train, global_rot=True))
    tr1 = Trainer(cfg1, stage=1, mesh=mesh, log_dir=str(tmp_path))
    tr1.load_glb(path)
    a = jax.tree_util.tree_leaves(jax.device_get(tr1.glb_params))
    b = jax.tree_util.tree_leaves(jax.device_get(p0))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y)


def test_checkpoint_roundtrip_and_safe_load(tmp_path):
    cfg = _cfg(tmp_path, 0)
    tr = Trainer(cfg, stage=0, mesh=make_mesh(1), log_dir=str(tmp_path))
    batch = next(iter(tr.loader))
    tr.init_params(batch)
    path = os.path.join(str(tmp_path), "test.msgpack")
    save_checkpoint(path, jax.device_get(tr.params))
    restored = load_checkpoint(path, jax.device_get(tr.params))
    a = jax.tree_util.tree_leaves(restored)
    b = jax.tree_util.tree_leaves(jax.device_get(tr.params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y)
    merged, n = safe_load_common(tr.params, restored)
    assert n == len(a)


def test_stage1_axis_prior_training(tmp_path):
    """slot_single_mode=0: the axis-prior EMA threads through the DP step."""
    cfg = _cfg(tmp_path, 1)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, slot_single_mode=False)
    )
    tr = Trainer(cfg, stage=1, mesh=make_mesh(2), log_dir=str(tmp_path))
    tr.train(num_steps=2)
    prior = np.asarray(jax.device_get(tr.axis_prior))
    assert prior.shape == (cfg.model.nmasks, 3)
    # pmean of per-shard unit priors is sub-unit when shards disagree
    np.testing.assert_allclose(np.linalg.norm(prior, axis=-1), 1.0, atol=1e-2)


def test_stage1_partial_view_motion_pair_feat(tmp_path):
    """The partlap recipe's exact flag combination on the tiny preset:
    partial-view synthetic data (independent posed/canonical orderings) +
    motion-pair loss with FEATURE correspondence + attention-temperature
    anneal.  Guards the chip arm against an unexercised-path crash
    (ref MotionDatasetPartial.py:170-499 is the data regime)."""
    cfg = _cfg(tmp_path, 1)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, partial=True),
        model=dataclasses.replace(
            cfg.model,
            motion_pair_factor=1.0,
            motion_pair_corr="feat",
            attn_temp_start=4.0,
            attn_temp_steps=10,
            purity_factor=1.0,
            purity_warmup_steps=10,
        ),
    )
    tr = Trainer(cfg, stage=1, mesh=make_mesh(2), log_dir=str(tmp_path))
    params = tr.train(num_steps=2)
    assert params is not None
    summ = dict(tr.summary.items())
    assert "mp" in summ and np.isfinite(summ["mp"])
    assert "mt_iou" in summ and 0.0 <= summ["mt_iou"] <= 1.0
