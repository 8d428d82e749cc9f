"""Tracing / profiling helpers (SURVEY.md §5.1 — absent in the reference,
which only prints wall-clock and CUDA max-memory per iteration).

- :func:`trace`: context manager around ``jax.profiler`` writing a
  TensorBoard-viewable trace.
- :func:`step_timer`: rolling per-step wall-clock with a sync on a output
  leaf (through the tunneled TPU platform only a device→host fetch
  synchronizes; see bench.py).
- :func:`flops_estimate`: XLA AOT cost analysis of a jitted fn.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class step_timer:
    """Usage::

        timer = step_timer()
        for batch in loader:
            state, loss = train_step(state, batch, key)
            dt = timer.tick(loss)   # syncs on loss fetch
    """

    def __init__(self):
        self.t0 = time.perf_counter()
        self.history: list[float] = []

    def tick(self, sync_leaf=None) -> float:
        if sync_leaf is not None:
            float(jax.device_get(sync_leaf).ravel()[0]) if hasattr(
                sync_leaf, "ravel"
            ) else float(sync_leaf)
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        self.history.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.history) / max(len(self.history), 1)


def flops_estimate(fn, *args, **kwargs) -> dict:
    """Compile-time cost analysis of a jittable fn (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return dict(analysis)
    except Exception:
        return {}
