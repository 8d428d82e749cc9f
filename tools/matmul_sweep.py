"""Achievable MXU rate vs matmul shape on the tunneled chip.

The encoder micro showed a [4096,768]x[768,3072] FFN pair at only ~30 TF/s
while 8192^3 reaches 167 TF/s (tools/mxu_calib.py). This sweeps M/K/N to
locate the cliff so the model's GEMM shapes can be chosen against it.
Timing: fori_loop with the input loop-carried, one scalar fetch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("ITERS", "400"))


def rate(m, k, n, dtype=jnp.bfloat16, acc=None):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), dtype)
    w = jnp.asarray(rng.standard_normal((k, n)), dtype)

    @jax.jit
    def loop(x, w):
        def body(i, c):
            z = jax.lax.dot_general(
                x + c.astype(dtype), w, (((1,), (0,)), ((), ())),
                preferred_element_type=acc,
            )
            return jnp.sum(z.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    float(loop(x, w))
    t0 = time.perf_counter()
    float(loop(x, w))
    dt = (time.perf_counter() - t0) / ITERS
    fl = 2 * m * k * n
    by = (m * k + k * n + m * n) * jnp.dtype(dtype).itemsize
    print(f"[{m:6d},{k:5d}]x[{k:5d},{n:5d}] acc={str(acc or dtype.__name__):9s}"
          f" {dt * 1e3:8.3f} ms  {fl / dt / 1e12:7.1f} TF/s"
          f"  ({by / dt / 1e9:6.1f} GB/s)")


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    for shape in [
        (4096, 768, 3072),
        (4096, 3072, 768),
        (4096, 768, 768),
        (8192, 768, 3072),
        (16384, 768, 3072),
        (4096, 1536, 3072),
        (4096, 768, 6144),
        (4096, 4096, 4096),
        (8192, 8192, 8192),
    ]:
        rate(*shape)
    # accumulation dtype effect at the BERT FFN shape
    rate(4096, 768, 3072, acc=jnp.float32)
    rate(8192, 8192, 8192, acc=jnp.float32)


if __name__ == "__main__":
    main()
