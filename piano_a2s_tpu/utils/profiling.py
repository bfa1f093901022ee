"""Profiling / tracing hooks (the reference has none; SURVEY.md §5 requires
the rebuild to add them): jax.profiler trace capture around regions and a
lightweight per-step timer with TPU-safe synchronization."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable XLA trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a trace (shows up on the timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock per-step timing with explicit device sync.

    Note: on some platforms (the axon TPU tunnel) block_until_ready does
    not block; sync forces a 1-element device->host transfer instead.
    """

    def __init__(self):
        self.durations: Dict[str, List[float]] = {}
        self._start: Optional[float] = None
        self._name: Optional[str] = None

    @staticmethod
    def sync(tree) -> None:
        leaves = jax.tree.leaves(tree)
        if leaves:
            jax.device_get(jax.numpy.ravel(leaves[0])[:1])

    @contextlib.contextmanager
    def time(self, name: str, result_tree=None):
        t0 = time.perf_counter()
        container = {}
        yield container
        if result_tree is not None:
            self.sync(result_tree)
        elif container:
            self.sync(list(container.values()))
        self.durations.setdefault(name, []).append(
            time.perf_counter() - t0)

    def summary(self, since: Optional[Dict[str, int]] = None
                ) -> Dict[str, Dict[str, float]]:
        """Stats over all recorded durations, or — with `since` (a mark
        from .mark()) — only those recorded after the mark (e.g. one
        epoch's steps, uncontaminated by earlier compile-heavy epochs)."""
        out = {}
        for name, vals in self.durations.items():
            if since is not None:
                vals = vals[since.get(name, 0):]
            if not vals:
                continue
            n = len(vals)
            out[name] = {
                "count": n,
                "mean_s": sum(vals) / n,
                "min_s": min(vals),
                "max_s": max(vals),
                "total_s": sum(vals),
            }
        return out

    def mark(self) -> Dict[str, int]:
        """Position marker for summary(since=...)."""
        return {name: len(vals) for name, vals in self.durations.items()}
