"""Shared timing discipline for the perf tools.

One implementation of the rules in docs/ARCHITECTURE.md "Benchmark
integrity" (learned the hard way, fixed fleet-wide in f354f79): time N
iterations inside ONE on-device ``fori_loop`` whose body keeps every input
leg loop-carried, fetch a single scalar — through the tunneled TPU runtime
only a device→host value fetch synchronizes, and it costs ~29 ms, so it
must amortize over ``iters`` ≥ 100.

Tools bind their trip count once: ``timed = make_timed(ITERS)``,
``loop = make_loop(ITERS)``.
"""

from __future__ import annotations

import os
import time

import jax


def iters_env(default: int = 100) -> int:
    return int(os.environ.get("ITERS", str(default)))


def make_timed(iters: int):
    """``timed(fn, *args)`` → ms per loop iteration. ``fn`` must run the
    whole ``iters``-trip on-device loop and return a scalar (or a tree whose
    first leaf is fetched to synchronize)."""

    def timed(fn, *args):
        out = fn(*args)  # compile + warm
        float(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / iters * 1e3

    return timed


def make_loop(iters: int):
    """``loop(body)`` → jitted ``run(*args)`` executing
    ``body(carry, *args)`` ``iters`` times on device. ``body`` must fold the
    carry into every input leg (XLA hoists loop-invariant subgraphs)."""

    def loop(body):
        @jax.jit
        def run(*args):
            return jax.lax.fori_loop(
                0, iters, lambda i, c: body(c, *args), 0.0
            )

        return run

    return loop
