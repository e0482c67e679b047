"""purity_warmup_steps: the purity term ramps linearly with the shipped
train step (config.py purity_warmup_steps docstring; the round-4 motivation
is the measured attention saturation attn_ent 0.93 -> 0.002 within ~400
steps when purity burns from step 0)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from equi_articulated_pose_tpu.config import get_config
from equi_articulated_pose_tpu.parallel.mesh import make_mesh
from equi_articulated_pose_tpu.train import Trainer


def _trainer(tmp_path, **model_kw):
    cfg = get_config("tiny")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset_type="synthetic", n_samples=4,
            npoints=cfg.model.input_num,
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=2, log_freq=1, save_freq=100,
            global_rot=False,
        ),
        model=dataclasses.replace(cfg.model, **model_kw),
        model_dir=str(tmp_path),
    )
    return Trainer(cfg, stage=1, mesh=make_mesh(1), log_dir=str(tmp_path))


def test_purity_warmup_scales_linearly(tmp_path):
    tr = _trainer(tmp_path, purity_factor=1.0, purity_warmup_steps=100)
    batch = next(iter(tr.loader))
    batch = {k: jnp.asarray(np.asarray(v)[:2]) for k, v in batch.items()}
    tr.init_params(batch)

    def loss_at(step):
        b = dict(batch)
        b["step_count"] = jnp.full((2,), step, jnp.int32)
        loss, _ = tr._loss_fn(tr.params, b, jax.random.PRNGKey(3))
        return float(loss)

    l0, l50, l100, l200 = (loss_at(s) for s in (0, 50, 100, 200))
    # ramp: at step 0 no purity term; at >= warmup the full term
    assert l0 < l50 < l100
    np.testing.assert_allclose(l100, l200, rtol=1e-5)        # clipped at 1
    np.testing.assert_allclose(l50 - l0, (l100 - l0) / 2, rtol=1e-3)

    # without step_count the factor is unscaled (eval/bench path)
    l_nostep = float(tr._loss_fn(tr.params, batch, jax.random.PRNGKey(3))[0])
    np.testing.assert_allclose(l_nostep, l100, rtol=1e-5)
