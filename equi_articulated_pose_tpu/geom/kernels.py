"""Kernel-point layouts for SO(3) point convolutions.

The reference ships fixed point clouds ``kpsphere{24,30,66}.ply`` (ref
``so3conv/functional.py:111-121``) as convolution kernel supports.  We generate
equivalent near-uniform ball layouts analytically (Fibonacci shells + centre),
keeping the same point counts per ``kernel_size`` so parameter shapes match the
reference architecture.  Exact positions are a free design choice — the per
kernel-point weights are learned.
"""
from __future__ import annotations

import functools

import numpy as np

KERNEL_CONDENSE_RATIO = 0.7  # ref: so3conv/modules.py:16

_KS_TO_NUM = {1: 24, 2: 30, 3: 66}


def fibonacci_sphere(n: int) -> np.ndarray:
    """n near-uniform points on the unit sphere."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0 ** 0.5) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], -1
    )


@functools.lru_cache(maxsize=None)
def _unit_ball_kernel(num: int) -> np.ndarray:
    """Centre point + concentric Fibonacci shells filling the unit ball."""
    if num <= 1:
        return np.zeros((1, 3))
    pts = [np.zeros((1, 3))]
    remaining = num - 1
    # Split remaining points over shells with counts ∝ r² (area).
    n_shells = 1 if remaining <= 16 else 2
    if n_shells == 1:
        pts.append(fibonacci_sphere(remaining))
    else:
        inner = max(4, int(round(remaining * 0.25)))
        outer = remaining - inner
        pts.append(0.55 * fibonacci_sphere(inner))
        pts.append(fibonacci_sphere(outer))
    out = np.concatenate(pts, axis=0)
    assert out.shape[0] == num
    return out


def spherical_kernel_points(radius: float, kernel_size: int) -> np.ndarray:
    """[ks, 3] kernel points scaled so max norm == radius.

    ``kernel_size`` in {1, 2, 3} maps to {24, 30, 66} points (ref mapping
    ``so3conv/functional.py:113``).
    """
    num = _KS_TO_NUM[kernel_size]
    pts = _unit_ball_kernel(num).copy()
    return (pts * radius).astype(np.float32)
