"""Point-cloud augmentation (ref ``vgtk/vgtk/pc/augmentation.py:16-219``):
random/anchor rotation, jitter, dropout, uniform resample, radius search."""
from __future__ import annotations

import numpy as np

from ..geom import so3 as so3g


def rotate_point_cloud(pc: np.ndarray, rng: np.random.RandomState,
                       mode: str = "random") -> tuple[np.ndarray, np.ndarray]:
    """Returns (rotated pc, R).  mode 'anchor' draws from the 60-anchor set."""
    if mode == "anchor":
        R = so3g.ANCHORS[rng.randint(0, 60)].astype(np.float64)
    else:
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
    return pc @ R.T, R


def jitter_point_cloud(pc: np.ndarray, rng: np.random.RandomState,
                       sigma: float = 0.01, clip: float = 0.05) -> np.ndarray:
    noise = np.clip(sigma * rng.randn(*pc.shape), -clip, clip)
    return pc + noise


def random_dropout(pc: np.ndarray, rng: np.random.RandomState,
                   max_ratio: float = 0.2) -> np.ndarray:
    """Drop a random fraction, refilling with repeats (fixed shape)."""
    n = len(pc)
    drop = int(rng.uniform(0, max_ratio) * n)
    if drop == 0:
        return pc
    keep = rng.permutation(n)[: n - drop]
    refill = keep[rng.randint(0, len(keep), drop)]
    return pc[np.concatenate([keep, refill])]


def uniform_resample_index(pc: np.ndarray, n_sample: int,
                           rng: np.random.RandomState) -> np.ndarray:
    n = len(pc)
    if n >= n_sample:
        return rng.permutation(n)[:n_sample]
    return np.concatenate([np.arange(n), rng.randint(0, n, n_sample - n)])


def radius_neighbors(pc: np.ndarray, centers: np.ndarray, radius: float,
                     max_k: int = 64) -> np.ndarray:
    """Brute-force radius search -> [M, max_k] indices, repeat-padded
    (ref KDTree search pc/sample.py:115-135)."""
    d2 = ((centers[:, None] - pc[None]) ** 2).sum(-1)
    out = np.zeros((len(centers), max_k), dtype=np.int64)
    for i in range(len(centers)):
        found = np.where(d2[i] < radius * radius)[0]
        if len(found) == 0:
            continue
        row = np.full(max_k, found[0])
        row[: min(max_k, len(found))] = found[:max_k]
        out[i] = row
    return out
