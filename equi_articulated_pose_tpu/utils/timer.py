"""Named wall-clock checkpoints (ref ``vgtk/vgtk/app/timer.py:3-17``)."""
from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self._t = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._t
        self._t = now
        return dt
