"""Motion-based attention pairing (nn/motion_pair.py).

Covers: weighted Kabsch exactness, rigid-motion EM cluster recovery on a
synthetic two-part articulation, slot-permutation matching, gradient routing
(only the attention carries gradient), the articulation gate, and the
attention temperature anneal.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from equi_articulated_pose_tpu.nn.motion_pair import (
    feature_correspondence,
    match_to_slots,
    motion_cluster_targets,
    motion_pair_attention_loss,
    weighted_kabsch,
)


def _rot(axis, theta):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K


def _two_part_pair(rng, n_static=300, n_move=80, theta=0.8, noise=0.0):
    """Canonical + posed clouds: a static slab plus a door rotating about a
    hinge — index-aligned, like data/articulated.py emits."""
    static = rng.uniform(-0.5, 0.5, (n_static, 3))
    static[:, 2] *= 0.2
    door = rng.uniform(-0.5, 0.5, (n_move, 3))
    door[:, 0] = door[:, 0] * 0.05 + 0.55     # thin door hinged at x=0.5
    canon = np.concatenate([static, door], 0)
    R = _rot([0, 1, 0], theta)
    pivot = np.array([0.5, 0.0, 0.0])
    posed = canon.copy()
    posed[n_static:] = (door - pivot) @ R.T + pivot
    if noise:
        posed = posed + rng.normal(0, noise, posed.shape)
    labels = np.concatenate(
        [np.zeros(n_static, np.int32), np.ones(n_move, np.int32)]
    )
    return (
        canon.astype(np.float32),
        posed.astype(np.float32),
        labels,
    )


def test_weighted_kabsch_exact(rng):
    src = rng.randn(2, 50, 3).astype(np.float32)
    R_true = np.stack([_rot([1, 2, 3], 0.7), _rot([0, 0, 1], -1.2)])
    t_true = rng.randn(2, 3).astype(np.float32)
    dst = np.einsum("bij,bnj->bni", R_true, src) + t_true[:, None]
    w = rng.uniform(0.1, 1.0, (2, 50)).astype(np.float32)
    R, t = weighted_kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)
    # proper rotations
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)


def test_kabsch_degenerate_weights_no_nan(rng):
    src = rng.randn(1, 20, 3).astype(np.float32)
    dst = src + 0.1
    w = np.zeros((1, 20), np.float32)  # empty cluster
    R, t = weighted_kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    assert np.isfinite(np.asarray(R)).all() and np.isfinite(np.asarray(t)).all()


@pytest.mark.parametrize("theta", [0.5, 1.2])
def test_motion_cluster_recovers_parts(rng, theta):
    canon, posed, labels = _two_part_pair(rng, theta=theta, noise=0.003)
    q, gate = motion_cluster_targets(
        jnp.asarray(canon)[None], jnp.asarray(posed)[None], 2
    )
    q = np.asarray(q[0])                       # [2, N]
    pred = q.argmax(0)
    acc = max((pred == labels).mean(), (pred == 1 - labels).mean())
    assert acc > 0.97, f"motion clustering accuracy {acc:.3f}"
    assert float(gate[0]) > 0.5                # clearly articulated


def test_motion_cluster_skewed_sizes(rng):
    # oven-like occupancy [0.88, 0.12]: the 1/S quantile seed must not pin
    # the final clusters at balanced sizes
    canon, posed, labels = _two_part_pair(rng, n_static=440, n_move=60)
    q, _ = motion_cluster_targets(
        jnp.asarray(canon)[None], jnp.asarray(posed)[None], 2
    )
    pred = np.asarray(q[0]).argmax(0)
    acc = max((pred == labels).mean(), (pred == 1 - labels).mean())
    assert acc > 0.97


def test_gate_closes_without_articulation(rng):
    canon = rng.randn(1, 100, 3).astype(np.float32)
    R = _rot([1, 0, 0], 0.4)
    posed = np.einsum("ij,bnj->bni", R, canon) + 0.1  # one rigid motion only
    _, gate = motion_cluster_targets(
        jnp.asarray(canon), jnp.asarray(posed), 2
    )
    assert float(gate[0]) < 0.05


def test_match_to_slots_picks_agreeing_permutation(rng):
    q = jnp.asarray(rng.dirichlet(np.ones(3), (2, 40)).transpose(0, 2, 1))
    perm = np.array([2, 0, 1])
    attn = q[:, perm]          # attention = permuted target
    qm = match_to_slots(q, attn)
    np.testing.assert_allclose(np.asarray(qm), np.asarray(attn), atol=1e-6)


def test_loss_gradient_only_through_attention(rng):
    canon, posed, _ = _two_part_pair(rng)
    xyz = jnp.asarray(posed)[None]
    cxyz = jnp.asarray(canon)[None]
    logits = jnp.asarray(rng.randn(1, 2, canon.shape[0]).astype(np.float32))

    def f(logits, xyz):
        attn = jax.nn.softmax(logits, axis=1)
        loss, _ = motion_pair_attention_loss(attn, xyz, cxyz)
        return loss

    g_attn = jax.grad(f, argnums=0)(logits, xyz)
    g_xyz = jax.grad(f, argnums=1)(logits, xyz)
    assert float(jnp.abs(g_attn).max()) > 0.0
    np.testing.assert_allclose(np.asarray(g_xyz), 0.0, atol=1e-7)


def test_loss_decreases_toward_target(rng):
    canon, posed, labels = _two_part_pair(rng)
    xyz = jnp.asarray(posed)[None]
    cxyz = jnp.asarray(canon)[None]
    oh = jax.nn.one_hot(jnp.asarray(labels)[None], 2, axis=-1).transpose(0, 2, 1)
    good = 0.98 * oh + 0.01
    bad = jnp.full_like(good, 0.5)
    l_good, _ = motion_pair_attention_loss(good, xyz, cxyz)
    l_bad, _ = motion_pair_attention_loss(bad, xyz, cxyz)
    assert float(l_good) < float(l_bad)


def test_feature_correspondence_exact_match(rng):
    feat = rng.randn(1, 30, 8).astype(np.float32)
    src = rng.randn(1, 30, 3).astype(np.float32)
    perm = rng.permutation(30)
    out = feature_correspondence(
        jnp.asarray(feat[:, perm]), jnp.asarray(feat), jnp.asarray(src)
    )
    np.testing.assert_allclose(np.asarray(out)[0], src[0, perm], atol=1e-6)


def test_jit_and_shapes(rng):
    canon, posed, _ = _two_part_pair(rng, n_static=100, n_move=28)
    xyz = jnp.asarray(np.stack([posed, posed]))
    cxyz = jnp.asarray(np.stack([canon, canon]))
    attn = jax.nn.softmax(jnp.asarray(rng.randn(2, 2, 128)), axis=1)
    loss, q = jax.jit(
        lambda a, x, c: motion_pair_attention_loss(a, x, c)
    )(attn, xyz, cxyz)
    assert q.shape == (2, 2, 128)
    assert np.isfinite(float(loss))


def test_attn_temperature_anneal():
    from equi_articulated_pose_tpu.nn.slot_attention import SlotAttention

    m = SlotAttention(num_slots=2, dim=16, iters=2, hidden_dim=16)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 24, 16), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    _, a_hot = m.apply(p, x, None, jnp.asarray(8.0))
    _, a_cold = m.apply(p, x, None, None)

    def ent(a):
        pn = a / a.sum(1, keepdims=True)
        return float(-(pn * jnp.log(jnp.clip(pn, 1e-8))).sum(1).mean())

    assert ent(a_hot) > ent(a_cold)


def test_spatial_term_separates_identical_motions():
    """Two compact parts translated by the SAME vector (the drawer failure
    mode) merge under pure motion clustering; the spatial-coherence term
    splits them.  w=0 must stay bit-compatible with the original targets."""
    rng = np.random.RandomState(0)
    static = rng.uniform(-0.6, 0.6, (200, 3)).astype(np.float32)
    static[:, 1] *= 0.1
    boxa = rng.uniform(-0.15, 0.15, (80, 3)).astype(np.float32)
    boxa[:, 1] += 1.0
    boxb = rng.uniform(-0.15, 0.15, (80, 3)).astype(np.float32)
    boxb[:, 1] += 2.0
    canon = np.concatenate([static, boxa, boxb], 0)
    d = np.array([0.0, 0.0, 0.3], np.float32)
    posed = canon.copy()
    posed[200:] += d                         # both boxes move identically
    labels = np.concatenate(
        [np.zeros(200, np.int32), np.ones(80, np.int32), np.full(80, 2, np.int32)]
    )

    src = jnp.asarray(canon)[None]
    dst = jnp.asarray(posed)[None]

    def iou(q):
        hard = np.asarray(jnp.argmax(q, 1))[0]
        best = 0.0
        import itertools as it

        for perm in it.permutations(range(3)):
            m = np.asarray(perm)[hard]
            vals = []
            for p in range(3):
                inter = np.sum((m == p) & (labels == p))
                union = np.sum((m == p) | (labels == p))
                vals.append(inter / max(union, 1))
            best = max(best, float(np.mean(vals)))
        return best

    q0, gate0 = motion_cluster_targets(src, dst, 3)
    qs, gates = motion_cluster_targets(
        src, dst, 3, spatial_weight=0.3, spatial_tau=0.04
    )
    np.testing.assert_allclose(np.asarray(gate0), np.asarray(gates))
    # pure motion cannot tell the boxes apart; spatial coherence can
    assert iou(qs) > 0.95, iou(qs)
    assert iou(qs) > iou(q0) + 0.2, (iou(qs), iou(q0))
