"""Timers (utils/timer.py analogue).

`Timer` brackets keyed spans with jax.block_until_ready on a sentinel (the
torch.cuda.synchronize() analogue, reference utils/timer.py:6-84) — only when
enabled, so the hot path never syncs in production. `End2endTimer` accumulates
wall-clock excluding eval/save windows (:87-111).
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Optional

import jax


def drain(x) -> None:
    """Actually wait for device work producing `x`. On the axon-tunneled TPU
    jax.block_until_ready returns before the remote queue drains, so timings
    bracketed with it alone are fiction — pulling one scalar element forces a
    real round-trip."""
    if x is None:
        return
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ndim"):
            try:
                float(leaf.reshape(-1)[0])
            except Exception:
                jax.block_until_ready(leaf)
            return
    jax.block_until_ready(x)


class Timer:
    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self.sums = defaultdict(float)
        self.counts = defaultdict(int)
        self._open = {}

    def start(self, key: str, sync=None):
        if not self.enabled:
            return
        if sync is not None:
            drain(sync)
        self._open[key] = time.perf_counter()

    def stop(self, key: str, sync=None):
        if not self.enabled or key not in self._open:
            return
        if sync is not None:
            drain(sync)
        dt = time.perf_counter() - self._open.pop(key)
        self.sums[key] += dt
        self.counts[key] += 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.sums):
            lines.append(
                f"{k}: sum {self.sums[k]*1e3:.2f} ms over {self.counts[k]} calls"
            )
        return "\n".join(lines)


class End2endTimer:
    def __init__(self):
        self.total = 0.0
        self._t0: Optional[float] = None

    def start(self):
        if self._t0 is None:
            self._t0 = time.perf_counter()

    def pause(self, sync=None):
        if self._t0 is not None:
            if sync is not None:
                jax.block_until_ready(sync)
            self.total += time.perf_counter() - self._t0
            self._t0 = None

    def elapsed(self) -> float:
        out = self.total
        if self._t0 is not None:
            out += time.perf_counter() - self._t0
        return out
