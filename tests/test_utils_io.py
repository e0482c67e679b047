"""PLY IO, augmentation, profiling-artifact utilities."""
import numpy as np

from equi_articulated_pose_tpu.data.ply import load_ply, save_ply
from equi_articulated_pose_tpu.data.augmentation import (
    jitter_point_cloud,
    radius_neighbors,
    random_dropout,
    rotate_point_cloud,
    uniform_resample_index,
)
from equi_articulated_pose_tpu.utils.profiling import load_artifacts, save_artifacts


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.randn(50, 3).astype(np.float32)
    p = str(tmp_path / "x.ply")
    save_ply(p, pts)
    back = load_ply(p)
    np.testing.assert_allclose(back, pts, atol=1e-5)
    save_ply(p, pts, colors=np.full((50, 3), 128, np.uint8))
    back = load_ply(p)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_augmentations(rng):
    pc = rng.randn(100, 3)
    out, R = rotate_point_cloud(pc, rng)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(pc, axis=-1), atol=1e-8
    )
    _, Ra = rotate_point_cloud(pc, rng, mode="anchor")
    j = jitter_point_cloud(pc, rng, sigma=0.01, clip=0.02)
    assert np.abs(j - pc).max() <= 0.02 + 1e-9
    d = random_dropout(pc, rng)
    assert d.shape == pc.shape
    idx = uniform_resample_index(pc, 40, rng)
    assert idx.shape == (40,)
    nb = radius_neighbors(pc, pc[:5], 0.8, max_k=8)
    assert nb.shape == (5, 8)


def test_artifacts_roundtrip(tmp_path, rng):
    arrays = {"a": rng.randn(4, 3).astype(np.float32), "b": np.arange(5)}
    p = str(tmp_path / "art.npz")
    save_artifacts(p, arrays)
    back = load_artifacts(p)
    np.testing.assert_allclose(back["a"], arrays["a"])
    np.testing.assert_array_equal(back["b"], arrays["b"])


def test_train_state_checkpoint_roundtrip(tmp_path):
    """Full-train-state checkpoints restore Adam moments and the schedule
    position; weight-only files still load (step 0, opt untouched)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from equi_articulated_pose_tpu.train.checkpoint import (
        is_train_state,
        load_train_state,
        save_checkpoint,
        save_train_state,
    )

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros((3,))}
    tx = optax.adam(optax.exponential_decay(1e-3, 100, 0.7))
    opt = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(5):
        upd, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, upd)

    p = str(tmp_path / "state.msgpack")
    save_train_state(p, params, opt, 5)
    assert is_train_state(p)

    fresh_opt = tx.init(jax.tree_util.tree_map(jnp.zeros_like, params))
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    rp, ro, st, prior = load_train_state(p, zeros, fresh_opt)
    assert st == 5
    assert prior is None          # pre-axis_prior files stay loadable
    np.testing.assert_allclose(np.asarray(rp["w"]), np.asarray(params["w"]))
    # Adam count (schedule position) restored
    counts = [np.asarray(l) for l in jax.tree_util.tree_leaves(ro)
              if np.asarray(l).dtype == np.int32 and np.asarray(l).shape == ()]
    assert any(c == 5 for c in counts)

    # axis_prior (slot_single_mode=0 orbit-selection EMA) rides along
    p3 = str(tmp_path / "state_prior.msgpack")
    ap = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    save_train_state(p3, params, opt, 7, axis_prior=ap)
    _, _, st3, prior3 = load_train_state(p3, zeros, fresh_opt)
    assert st3 == 7
    np.testing.assert_allclose(np.asarray(prior3), np.asarray(ap))

    # weight-only file: not a train state, loads with step 0
    p2 = str(tmp_path / "weights.msgpack")
    save_checkpoint(p2, params)
    assert not is_train_state(p2)
    rp2, ro2, st2, _ = load_train_state(p2, zeros, fresh_opt)
    assert st2 == 0
    np.testing.assert_allclose(np.asarray(rp2["b"]), np.asarray(params["b"]))
