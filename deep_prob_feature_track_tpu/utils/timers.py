"""Wall-clock stage timers + jax profiler scopes.

Rewrite of ``code/timers.py`` with two upgrades for the TPU stack:
``Timers.time()`` context-managers double as ``jax.profiler.TraceAnnotation``
scopes so stages show up in XLA profiles, and ``block`` optionally syncs the
device so asynchronous dispatch does not fold every stage into the last.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class Timers:
    def __init__(self, enabled: bool = True, block: bool = False):
        self.enabled = enabled
        self.block = block
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._starts: Dict[str, float] = {}

    def tic(self, name: str):
        if not self.enabled:
            return
        if self.block:
            self._sync()
        self._starts[name] = time.perf_counter()

    def toc(self, name: str):
        if not self.enabled or name not in self._starts:
            return
        if self.block:
            self._sync()
        dt = time.perf_counter() - self._starts.pop(name)
        self.totals[name] += dt
        self.counts[name] += 1

    @contextlib.contextmanager
    def time(self, name: str):
        """Timer + profiler trace annotation scope."""
        if not self.enabled:
            yield
            return
        try:
            import jax.profiler

            ann = jax.profiler.TraceAnnotation(name)
        except Exception:  # pragma: no cover
            ann = contextlib.nullcontext()
        with ann:
            self.tic(name)
            try:
                yield
            finally:
                self.toc(name)

    @staticmethod
    def _sync():
        try:
            import jax

            jax.effects_barrier()
        except Exception:  # pragma: no cover
            pass

    def mean(self, name: str) -> float:
        c = self.counts[name]
        return self.totals[name] / c if c else 0.0

    def summary(self) -> str:
        lines = ["stage timings (mean over calls):"]
        for name in sorted(self.totals):
            lines.append(
                f"  {name:<40s} {self.mean(name) * 1e3:9.3f} ms x{self.counts[name]}"
            )
        return "\n".join(lines)

    def print(self):
        print(self.summary())


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """Capture a jax profiler trace (open with TensorBoard/XProf)."""
    if logdir is None:
        yield
        return
    import jax.profiler

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
