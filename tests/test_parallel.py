"""Multi-device (virtual 8-CPU mesh) data-parallel training tests."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from equi_articulated_pose_tpu.config import get_config
from equi_articulated_pose_tpu.models import SlotPoseModel
from equi_articulated_pose_tpu.nn.norm import EquivNorm
from equi_articulated_pose_tpu.parallel.dp import (
    make_dp_train_step,
    per_device_rngs,
    replicate,
    shard_batch,
)
from equi_articulated_pose_tpu.parallel.mesh import DATA_AXIS, make_mesh


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8


class _SmoothNet(nn.Module):
    """Dense + cross-replica EquivNorm: smooth, so DP must match exactly."""

    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):  # x: [B, N, 3]
        h = nn.Dense(16)(x)
        h = EquivNorm(kind="batch", axis_name=self.axis_name)(h)
        h = jax.nn.gelu(h)
        return nn.Dense(1)(h)


def test_dp_step_matches_single_device_exactly():
    """8-way sharded step (grads + SyncBN stats pmean'd) == one-device step on
    the full batch, for a smooth model."""
    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)
    net = _SmoothNet(axis_name=DATA_AXIS)
    init_net = _SmoothNet()

    rng = np.random.RandomState(0)
    batch = {"pc": jnp.asarray(rng.randn(8, 32, 3).astype(np.float32))}
    params = init_net.init(jax.random.PRNGKey(0), batch["pc"][:1])
    tx = optax.sgd(1e-2)
    opt_state = tx.init(params["params"])

    def loss_fn(p, b, r):
        out, mstate = net.apply(p, b["pc"], mutable=["batch_stats"])
        return jnp.mean(out**2), ({"m": jnp.mean(out)}, mstate)

    step8 = make_dp_train_step(loss_fn, tx, mesh8, donate=False)
    step1 = make_dp_train_step(loss_fn, tx, mesh1, donate=False)
    p8, _, m8 = step8(
        replicate(params, mesh8),
        replicate(opt_state, mesh8),
        shard_batch(batch, mesh8),
        shard_batch(per_device_rngs(jax.random.PRNGKey(5), mesh8), mesh8),
    )
    p1, _, m1 = step1(
        replicate(params, mesh1),
        replicate(opt_state, mesh1),
        shard_batch(batch, mesh1),
        shard_batch(per_device_rngs(jax.random.PRNGKey(5), mesh1), mesh1),
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(p8)),
        jax.tree_util.tree_leaves(jax.device_get(p1)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(np.asarray(m8["loss"]).mean()),
        float(np.asarray(m1["loss"]).mean()),
        rtol=1e-5,
    )


def test_dp_full_model_smoke():
    """The flagship model trains one 8-way DP step: finite loss, finite and
    synchronised (replicated) parameter update."""
    mesh = make_mesh(8)
    cfg = get_config("tiny").model
    model = SlotPoseModel(cfg=cfg, axis_name=DATA_AXIS)
    init_model = SlotPoseModel(cfg=cfg)

    rng = np.random.RandomState(1)
    batch = {"pc": jnp.asarray(rng.randn(8, cfg.input_num, 3).astype(np.float32) * 0.3)}
    params = init_model.init(
        jax.random.PRNGKey(0), batch["pc"][:1], jax.random.PRNGKey(1)
    )
    tx = optax.adam(1e-4)
    opt_state = tx.init(params["params"])

    def loss_fn(p, b, r):
        (loss, out), mstate = model.apply(p, b["pc"], None, mutable=["batch_stats"])
        return loss, ({"glb": out["glb_loss"]}, mstate)

    step = make_dp_train_step(loss_fn, tx, mesh, donate=False)
    p2, _, metrics = step(
        replicate(params, mesh),
        replicate(opt_state, mesh),
        shard_batch(batch, mesh),
        shard_batch(per_device_rngs(jax.random.PRNGKey(2), mesh), mesh),
    )
    assert np.isfinite(float(np.asarray(metrics["loss"]).mean()))
    leaves = jax.tree_util.tree_leaves(jax.device_get(p2))
    assert all(np.isfinite(l).all() for l in leaves)
    # something actually moved
    moved = [
        float(np.abs(a - b).max())
        for a, b in zip(leaves, jax.tree_util.tree_leaves(jax.device_get(params)))
    ]
    assert max(moved) > 0
