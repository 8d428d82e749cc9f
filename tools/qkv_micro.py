"""A/B: three separate QKV projection GEMMs vs one merged [D, 3D] GEMM.

VERDICT r4 #6 (encoder inference slack): the attention phase reads the
layer input three times — once per Q/K/V ``nn.Dense``
(``models/bert.py::SelfAttention``). Merging the three kernels into one
[D, 3D] GEMM reads it once, saving ~2·N·D·2 bytes/layer (~25 MB at bench
shapes, ~0.38 ms/fwd ceiling at the 794 GB/s roofline over 12 layers).
This micro measures whether the merge actually wins on the chip, including
the consumer-side cost of slicing the packed [N, 3D] output back into
three operands (a Pallas call can't fuse a slice, so the flash path would
need packed-operand BlockSpecs — only worth building if this A/B wins).

Rows: (a) 3 separate GEMMs; (b) merged GEMM consumed via 3 slices;
(c) merged GEMM consumed whole (upper bound).

Usage: python tools/qkv_micro.py   (ITERS= env, default 200)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools._timing import make_timed

ITERS = int(os.environ.get("ITERS", "200"))
N, D = 16 * 512, 768  # bench shapes: bs 16, T 512 (bench.py)
timed = make_timed(ITERS)


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
    wq, wk, wv = (
        jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)
        for _ in range(3)
    )
    wm = jnp.concatenate([wq, wk, wv], axis=1)

    def consume(q, k, v):
        # Emulate three independent downstream consumers (the flash kernel's
        # three operands) without building attention: one reduction each.
        return (
            jnp.sum(q.astype(jnp.float32))
            + jnp.sum(k.astype(jnp.float32)) * 2.0
            + jnp.sum(v.astype(jnp.float32)) * 3.0
        ) * 1e-9

    @jax.jit
    def separate(x, wq, wk, wv):
        def body(i, c):
            xi = x + c.astype(jnp.bfloat16)
            return consume(xi @ wq, xi @ wk, xi @ wv)

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    @jax.jit
    def merged_sliced(x, wm):
        def body(i, c):
            qkv = (x + c.astype(jnp.bfloat16)) @ wm
            return consume(qkv[:, :D], qkv[:, D : 2 * D], qkv[:, 2 * D :])

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    @jax.jit
    def merged_whole(x, wm):
        def body(i, c):
            qkv = (x + c.astype(jnp.bfloat16)) @ wm
            return jnp.sum(qkv.astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    flops = 2 * N * D * 3 * D
    for name, fn, args in (
        ("3 separate GEMMs     ", separate, (x, wq, wk, wv)),
        ("merged GEMM, 3 slices", merged_sliced, (x, wm)),
        ("merged GEMM, whole   ", merged_whole, (x, wm)),
    ):
        ms = timed(fn, *args)
        print(f"{name}  {ms:7.3f} ms  ({flops / ms / 1e9:6.1f} TF/s)")
    print(f"per-encoder-fwd delta ceiling = 12 * (row_a - row_b) ms")


if __name__ == "__main__":
    main()
