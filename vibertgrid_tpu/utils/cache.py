"""Machine-scoped persistent compilation cache, OFF for multi-process CPU.

Two independent failure modes, both bisected on 2026-08-19:

1. **Foreign-machine entries (SIGILL risk).** The repo's ``.jax_cache``
   directory travels between machines (the builder sandbox and the
   driver's bench host share the checkout). jax's persistent cache key
   does NOT include the host's CPU feature set, so an XLA:CPU AOT entry
   compiled on an AMX-capable host gets loaded on a host without those
   features — the loader warns ``Machine type used for XLA:CPU
   compilation doesn't match`` and may SIGILL. Mitigation: every entry
   point scopes the cache directory by a fingerprint of (jaxlib version,
   CPU flags) — same machine → warm cache, different machine → clean
   sub-directory, never a foreign binary.

2. **Cache-deserialized executables desync gloo collectives (the
   deterministic ``test_multihost`` failure, VERDICT r3 #1).** Isolated
   by entry-level bisect: a 2-process CPU train step PASSES when both
   ranks compile ``jit_train_step`` fresh (3/3), and ABORTS with
   ``gloo … op.preamble.length <= op.nbytes. 128 vs 4`` when the ranks
   LOAD the same persistent-cache entry (3/3; deleting just that entry or
   setting ``jax_enable_compilation_cache=False`` flips the outcome).
   A freshly compiled XLA:CPU executable issues its independent
   collectives in a deterministic order shared by every rank; a
   DESERIALIZED one rebuilds its thunk graph with a per-process
   nondeterministic issue order, and gloo's per-pair TCP FIFO matching
   has no tags to disambiguate — first divergence aborts the pair.
   Machine-scoping cannot help (both ranks load the same entry);
   serializing flags (``--xla_cpu_multi_thread_eigen=false``,
   ``jax_cpu_enable_async_dispatch=False``) do not help (multi-device
   programs stay async). Mitigation: :func:`setup_compilation_cache`
   REFUSES to enable the persistent cache when the process is part of a
   multi-process CPU job — the only configuration where gloo transports
   collectives. Single-process multi-device meshes (in-process
   collectives) and real TPU backends (compiler-ordered collectives over
   ICI) keep the cache.
"""

from __future__ import annotations

import hashlib
import os

_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def machine_fingerprint() -> str:
    """Hash of (jaxlib version, /proc/cpuinfo flags): one cache namespace
    per distinct (compiler, host ISA) pair."""
    import jaxlib

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line.strip()
                    break
    except OSError:
        import platform

        flags = platform.processor() or platform.machine()
    return hashlib.sha1(
        f"{jaxlib.__version__}|{flags}".encode()
    ).hexdigest()[:12]


def compilation_cache_dir(root: str | None = None) -> str:
    return os.path.join(root or _ROOT, machine_fingerprint())


def setup_compilation_cache(root: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at the machine-scoped
    sub-directory — or DISABLE it for multi-process CPU jobs (gloo
    collective-order hazard, module docstring #2). Call before the first
    compilation; in multi-process jobs call AFTER
    ``jax.distributed.initialize`` so the process count is known."""
    import jax

    if jax.process_count() > 1 and jax.default_backend() == "cpu":
        jax.config.update("jax_enable_compilation_cache", False)
        return None
    path = compilation_cache_dir(root)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
