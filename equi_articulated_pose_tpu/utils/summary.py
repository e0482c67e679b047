"""EMA running-scalar summary (ref ``vgtk/vgtk/app/summary.py:3-28``,
momentum 0.9)."""
from __future__ import annotations


class Summary:
    def __init__(self, momentum: float = 0.9):
        self.momentum = momentum
        self._vals: dict[str, float] = {}

    def update(self, **scalars: float):
        for k, v in scalars.items():
            v = float(v)
            if k in self._vals:
                self._vals[k] = self.momentum * self._vals[k] + (1 - self.momentum) * v
            else:
                self._vals[k] = v

    def __getitem__(self, k: str) -> float:
        return self._vals[k]

    def items(self):
        return self._vals.items()

    def format(self) -> str:
        return " ".join(f"{k}={v:.5f}" for k, v in sorted(self._vals.items()))
