"""Calibrate achievable MXU rate + per-fetch overhead through the tunnel."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    rng = np.random.default_rng(0)

    for iters in (10, 40, 160):
        x = jnp.asarray(rng.standard_normal((4096, 768)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((768, 3072)), jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((3072, 768)), jnp.bfloat16)

        @jax.jit
        def loop(x, w1, w2):
            def body(i, c):
                y = (x + c.astype(jnp.bfloat16)) @ w1
                z = y @ w2
                return jnp.sum(z.astype(jnp.float32)) * 1e-12
            return jax.lax.fori_loop(0, iters, body, 0.0)

        float(loop(x, w1, w2))
        t0 = time.perf_counter()
        float(loop(x, w1, w2))
        dt = (time.perf_counter() - t0) / iters * 1e3
        flops = 2 * 2 * 4096 * 768 * 3072
        print(f"iters {iters:4d}: {dt:7.3f} ms/iter ({flops / dt / 1e9:6.1f} TF/s)")

    # big square matmul, high arithmetic intensity
    a = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.bfloat16)

    @jax.jit
    def sq(a, b):
        def body(i, c):
            z = (a + c.astype(jnp.bfloat16)) @ b
            return jnp.sum(z.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, 40, body, 0.0)

    float(sq(a, b))
    t0 = time.perf_counter()
    float(sq(a, b))
    dt = (time.perf_counter() - t0) / 40 * 1e3
    flops = 2 * 8192**3
    print(f"8192^3 matmul: {dt:7.3f} ms/iter ({flops / dt / 1e9:6.1f} TF/s)")


if __name__ == "__main__":
    main()
