"""Profiling / artifact observability.

TPU replacement for the reference's minimal wall-clock tracing and ad-hoc
``np.save`` out_feats dumps (SURVEY.md §5.1/§5.5): a jax.profiler trace
context (Perfetto-compatible) and a structured artifact writer.
"""
from __future__ import annotations

import contextlib
import os
from typing import Dict

import jax
import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a device trace viewable in Perfetto/TensorBoard."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def save_artifacts(path: str, arrays: Dict[str, np.ndarray]):
    """Structured replacement for the reference's out_feats .npy dumps
    (``unsup_..._40:3190``): one compressed npz per step/eval."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path, **{k: np.asarray(jax.device_get(v)) for k, v in arrays.items()}
    )


def load_artifacts(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
