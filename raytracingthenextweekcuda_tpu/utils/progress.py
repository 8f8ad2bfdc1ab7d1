"""Progress reporting.

Replaces the kernel-side atomicAdd pixel counter that printed every 10%
(main.cu:197-203) and the BVH build REPORT macros (BVH.cpp:36-45,173-187).
Host-side: progress ticks per completed pass/chunk, printed at configurable
percentage steps.
"""

from __future__ import annotations

import sys
import time


class Progress:
    def __init__(self, total: int, label: str = "Complete", step_percent: int = 10,
                 stream=sys.stderr):
        self.total = max(total, 1)
        self.label = label
        self.step = step_percent
        self.stream = stream
        self.done = 0
        self._next = step_percent
        self._t0 = time.perf_counter()

    def update(self, n: int = 1) -> None:
        self.done += n
        pct = self.done * 100.0 / self.total
        if pct >= self._next:
            elapsed = time.perf_counter() - self._t0
            self.stream.write(
                f"{self.label}: {min(pct, 100.0):.2f}%  ({elapsed:.1f}s)\n"
            )
            self.stream.flush()
            while self._next <= pct:
                self._next += self.step

    def finish(self) -> None:
        if self.done < self.total:
            self.update(self.total - self.done)
