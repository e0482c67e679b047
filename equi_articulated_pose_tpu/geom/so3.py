"""Icosahedral rotation group and SO(3) utilities (TPU-native build).

The reference implementation (``/root/reference/vgtk/vgtk/functional/rotation.py:117-344``)
constructs the 60-element icosahedral rotation group by loading ``sphere12.ply``
with trimesh and assembling per-face Euler rotations with an ad-hoc ±60° band
fix.  Here the group is generated *analytically* — closure over two vertex-axis
generators — which removes the trimesh/PLY dependency, guarantees exact group
closure, and gives a deterministic canonical ordering (identity at index 0).

Everything the reference derives from the group is reproduced from first
principles:

* ``ANCHORS``      — [60, 3, 3] rotation matrices (the group elements).
* ``TRACE_IDX``    — [60, 12] intra-conv gather table: ``TRACE_IDX[a, k]`` is the
  group index of ``R_a @ REL12[k]`` where ``REL12`` are the 12 elements of the
  72° conjugacy class (the "SO(3)-adjacent" anchors; ref uses face adjacency,
  ``rotation.py:275-314``).  Right-multiplication makes the table commute with
  the left action of the group, which is exactly the property intra-conv needs.
* ``left_perm_table`` — [60, 60] permutation table π[g, a] = idx(R_g @ R_a);
  used by equivariance tests and orbit logic.

All arrays are computed once at import in float64 numpy and rounded to
float32.
"""
from __future__ import annotations

import functools

import numpy as np

GOLDEN = (1.0 + 5.0 ** 0.5) / 2.0


# ---------------------------------------------------------------------------
# Group construction (numpy, import-time, deterministic)
# ---------------------------------------------------------------------------

def _axis_angle_matrix(axis: np.ndarray, angle: float) -> np.ndarray:
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    x, y, z = axis
    K = np.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
    return np.eye(3) + np.sin(angle) * K + (1.0 - np.cos(angle)) * (K @ K)


def _quat_from_matrix(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), numerically stable."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2.0
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        if i == 0:
            s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2.0
            w = (R[2, 1] - R[1, 2]) / s
            x = 0.25 * s
            y = (R[0, 1] + R[1, 0]) / s
            z = (R[0, 2] + R[2, 0]) / s
        elif i == 1:
            s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2.0
            w = (R[0, 2] - R[2, 0]) / s
            x = (R[0, 1] + R[1, 0]) / s
            y = 0.25 * s
            z = (R[1, 2] + R[2, 1]) / s
        else:
            s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2.0
            w = (R[1, 0] - R[0, 1]) / s
            x = (R[0, 2] + R[2, 0]) / s
            y = (R[1, 2] + R[2, 1]) / s
            z = 0.25 * s
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def _canonical_quat(q: np.ndarray) -> np.ndarray:
    """Fix quaternion sign: first component with |.| > eps must be positive."""
    for v in q:
        if abs(v) > 1e-8:
            return q if v > 0 else -q
    return q


def _generate_icosahedral_group() -> np.ndarray:
    """Generate all 60 rotations of the icosahedron by closure."""
    # Two non-collinear vertex axes of the icosahedron.
    v0 = np.array([0.0, 1.0, GOLDEN])
    v1 = np.array([0.0, -1.0, GOLDEN])
    g0 = _axis_angle_matrix(v0, 2.0 * np.pi / 5.0)
    g1 = _axis_angle_matrix(v1, 2.0 * np.pi / 5.0)

    elems = [np.eye(3)]

    def _find(R):
        for i, E in enumerate(elems):
            if np.trace(E @ R.T) > 3.0 - 1e-8:
                return i
        return -1

    frontier = [np.eye(3)]
    while frontier:
        nxt = []
        for E in frontier:
            for G in (g0, g1):
                cand = G @ E
                if _find(cand) < 0:
                    elems.append(cand)
                    nxt.append(cand)
        frontier = nxt
    assert len(elems) == 60, f"closure produced {len(elems)} elements"

    # Canonical deterministic ordering by quaternion, identity first.
    quats = np.stack([_canonical_quat(_quat_from_matrix(E)) for E in elems])
    order = np.lexsort(np.round(quats[:, ::-1], 9).T)[::-1]
    elems = np.stack([elems[i] for i in order])
    assert np.allclose(elems[0], np.eye(3), atol=1e-9)
    # Re-orthonormalise via SVD to kill accumulated error, then freeze.
    out = []
    for E in elems:
        u, _, vt = np.linalg.svd(E)
        out.append(u @ vt)
    return np.stack(out)


@functools.lru_cache(maxsize=1)
def _group_tables():
    Rs = _generate_icosahedral_group()  # [60, 3, 3] float64
    na = Rs.shape[0]

    # Pairwise product index table: prod_idx[i, j] = idx(R_i @ R_j).
    prods = np.einsum("iab,jbc->ijac", Rs, Rs)  # [60,60,3,3]
    tr = np.einsum("ijab,kab->ijk", prods, Rs)  # trace(P_ij @ R_k^T)
    prod_idx = np.argmax(tr, axis=-1).astype(np.int32)
    assert np.all(np.max(tr, axis=-1) > 3.0 - 1e-6), "closure violated"

    # Inverse table: inv_idx[i] = idx(R_i^T).
    tr_inv = np.einsum("iba,kab->ik", Rs, Rs)
    inv_idx = np.argmax(tr_inv, axis=-1).astype(np.int32)

    # 12 nearest non-identity elements = the 72° conjugacy class
    # (trace = 1 + 2 cos 72° = golden ratio).
    traces = np.einsum("iaa->i", Rs)
    rel12 = np.where(np.abs(traces - GOLDEN) < 1e-6)[0].astype(np.int32)
    assert rel12.shape[0] == 12

    # Intra-conv gather table: trace_idx[a, k] = idx(R_a @ R_{rel12[k]}).
    trace_idx = prod_idx[:, rel12]  # [60, 12]

    return (
        Rs.astype(np.float32),
        trace_idx.astype(np.int32),
        prod_idx,
        inv_idx,
        rel12,
    )


# Public, import-time constants ---------------------------------------------
ANCHORS, TRACE_IDX, PROD_IDX, INV_IDX, REL12_IDX = _group_tables()
IDENTITY_IDX = 0
NUM_ANCHORS = 60


def get_anchors(k: int = 60) -> np.ndarray:
    """Anchor subset selection (ref: ``so3conv/functional.py:2641-2653``).

    k=1 returns the identity anchor; k in {20, 40} returns evenly strided
    subsets; k=60 the full group; k=4 the azimuthal C4 subgroup about +y.
    """
    if k == 1:
        return ANCHORS[IDENTITY_IDX][None]
    if k == 4:
        return get_c4_y_anchors()
    if k == 20:
        return ANCHORS[::3]
    if k == 40:
        return ANCHORS.reshape(20, 3, 3, 3)[:, :2].reshape(-1, 3, 3)
    if k == 60:
        return ANCHORS
    if k == 240:
        # product anchors for the 2D (azimuthal) variants: R_a @ C4_z
        # (ref PointnetSO3ConvOurs.tot_anchors, base_so3conv.py:1153+)
        c4 = get_c4_y_anchors()
        return np.einsum("aij,zjk->azik", ANCHORS, c4).reshape(-1, 3, 3)
    raise ValueError(f"unsupported anchor count {k}")


def get_trace_idx() -> np.ndarray:
    return TRACE_IDX


def left_perm_table() -> np.ndarray:
    """π[g, a] = idx(R_g @ R_a) — the left action of g on anchor indices."""
    return PROD_IDX


def get_c4_y_anchors() -> np.ndarray:
    """4-fold azimuthal rotations about +y (ref ``so3conv/functional.py:29-46``)."""
    mats = []
    for i in range(4):
        t = i * np.pi / 2.0
        c, s = np.cos(t), np.sin(t)
        mats.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32))
    return np.stack(mats)


# ---------------------------------------------------------------------------
# JAX rotation utilities
# ---------------------------------------------------------------------------
import jax
import jax.numpy as jnp


def safe_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalise with a gradient that is finite at x == 0.

    ``x / clip(norm(x))`` guards the forward but its BACKWARD is NaN at
    exactly zero (d norm/dx = x/norm); rsqrt of the eps-shifted square sum is
    smooth everywhere.  Zero inputs occur in practice (e.g. pose heads on
    empty slots), so every normalisation on a learned quantity uses this.
    """
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalised quaternion (..., 4) [w, x, y, z] -> (..., 3, 3).

    Matches ``compute_rotation_matrix_from_quaternion`` (ref
    ``rotation.py:379-417``) semantics: input is normalised internally.
    A zero quaternion maps (smoothly) to the identity.
    """
    q = safe_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    xw, yw, zw = x * w, y * w, z * w
    r0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - zw), 2 * (xz + yw)], -1)
    r1 = jnp.stack([2 * (xy + zw), 1 - 2 * (xx + zz), 2 * (yz - xw)], -1)
    r2 = jnp.stack([2 * (xz - yw), 2 * (yz + xw), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([r0, r1, r2], -2)


def ortho6d_to_matrix(o: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation (..., 6) -> (..., 3, 3) via Gram-Schmidt
    (ref ``rotation.py:443-478``)."""
    a, b = o[..., :3], o[..., 3:]
    x = safe_normalize(a)
    z = safe_normalize(jnp.cross(x, b))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], -1)


def axis_angle_to_matrix(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues. axis (..., 3) need not be normalised; angle (...,)."""
    axis = safe_normalize(axis)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], -1),
            jnp.stack([z, zeros, -x], -1),
            jnp.stack([-y, x, zeros], -1),
        ],
        -2,
    )
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), K.shape)
    return eye + s * K + (1.0 - c) * (K @ K)


def rotation_trace(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
    """trace(Ra @ Rb^T) along the last two axes (broadcasting)."""
    return jnp.einsum("...ij,...ij->...", Ra, Rb)


def rotation_angle(Ra: jnp.ndarray, Rb: jnp.ndarray | None = None) -> jnp.ndarray:
    """Geodesic angle between rotations (radians)."""
    tr = jnp.einsum("...ii->...", Ra) if Rb is None else rotation_trace(Ra, Rb)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(cos)


def nearest_anchor_idx(R: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """argmax_a trace(R @ anchors[a]^T) — nearest group element index.

    R: (..., 3, 3); anchors: (A, 3, 3) -> (...,) int32.
    """
    tr = jnp.einsum("...ij,aij->...a", R, anchors)
    return jnp.argmax(tr, axis=-1).astype(jnp.int32)


def so3_mean(Rs: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Chordal L2 mean of rotations (ref ``rotation.py:481-519``).

    Rs: (..., N, 3, 3), weights: (..., N) or None -> (..., 3, 3).
    """
    if weights is None:
        Ce = jnp.sum(Rs, axis=-3)
    else:
        Ce = jnp.sum(weights[..., None, None] * Rs, axis=-3)
    u, _, vt = jnp.linalg.svd(Ce)
    det = jnp.linalg.det(u @ vt)
    d = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )
    return jnp.einsum("...ik,...k,...kj->...ij", u, d, vt)


def matrix_to_axis_angle(R: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 3, 3) -> (axis (..., 3), angle (...,)).

    Vectorised replacement of the reference's per-matrix Python loop
    (``unsup_..._40:1312-1358``).  Near angle 0 the axis is ill-defined;
    returns the (unnormalised-safe) skew vector direction there.
    """
    tr = jnp.einsum("...ii->...", R)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    angle = jnp.arccos(cos)
    ax = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin = jnp.sin(angle)
    near_pi = jnp.abs(sin) < 1e-5
    # Near π: use sqrt of diagonal of (R + I)/2.
    diag = jnp.clip((jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1) + 1.0) * 0.5, 0.0)
    ax_pi = jnp.sqrt(diag)
    # Fix signs from off-diagonals.
    sx = jnp.ones_like(ax_pi[..., 0])
    sy = jnp.sign(R[..., 0, 1] + R[..., 1, 0] + 1e-12)
    sz = jnp.sign(R[..., 0, 2] + R[..., 2, 0] + 1e-12)
    ax_pi = ax_pi * jnp.stack([sx, sy, sz], -1)
    axis = jnp.where(near_pi[..., None], ax_pi, ax / jnp.clip(2.0 * sin, 1e-8)[..., None])
    axis = axis / jnp.clip(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-8)
    return axis, angle


def random_rotation(key: jax.Array, shape: tuple = ()) -> jnp.ndarray:
    """Uniform random rotations via normalised quaternions."""
    q = jax.random.normal(key, shape + (4,))
    return quat_to_matrix(q)
