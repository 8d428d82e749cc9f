"""Micro-decomposition of the BERT encoder forward on the TPU chip.

Times (fori_loop + scalar fetch, bench shapes B=8, T=512, D=768):
  - one [4096,768]x[768,3072] matmul (achievable MXU rate reference)
  - the flash attention kernel alone (12 calls)
  - the encoder with attention replaced by identity (dense+LN+GELU only)
  - the full encoder, flash vs xla attention
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("ITERS", "200"))
B, T, D, H = 8, 512, 768, 12


from tools._timing import make_timed

timed = make_timed(ITERS)


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from vibertgrid_tpu.models.bert import TextEncoder, TextEncoderConfig
    from vibertgrid_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B * T, D)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((D, 4 * D)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * D, D)), jnp.bfloat16)

    @jax.jit
    def matmul_loop(x, w1, w2):
        def body(i, c):
            y = (x + c.astype(jnp.bfloat16)) @ w1
            z = y @ w2
            return jnp.sum(z.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    ms = timed(matmul_loop, x, w1, w2)
    flops = 2 * 2 * B * T * D * 4 * D
    print(f"ffn pair matmul            {ms:7.3f} ms  ({flops / ms / 1e9:6.1f} TF/s)")

    q = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
    bias = jnp.zeros((B, T), jnp.float32)

    @jax.jit
    def attn_loop(q):
        def body(i, c):
            out = flash_attention(
                q + c.astype(jnp.bfloat16), q, q, bias, jnp.int32(0),
                0.125, H, 0.0, False,
            )
            return jnp.sum(out.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    ms = timed(attn_loop, q)
    print(f"flash attention x1 layer   {ms:7.3f} ms  (x12 = {ms * 12:6.2f})")

    for impl in ("flash", "xla"):
        cfg = TextEncoderConfig.base("bert", 30522)
        import dataclasses
        cfg = dataclasses.replace(cfg, attention_impl=impl)
        enc = TextEncoder(cfg, jnp.bfloat16)
        ids = jnp.asarray(rng.integers(3, 30000, (B, T)), jnp.int32)
        am = jnp.ones((B, T), jnp.int32)
        v = enc.init({"params": jax.random.PRNGKey(0)}, ids, am,
                     deterministic=True)

        @jax.jit
        def enc_loop(v, ids):
            def body(i, c):
                out = enc.apply(v, ids + (c > 1e30).astype(jnp.int32), am,
                                deterministic=True)
                return jnp.mean(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        ms = timed(enc_loop, v, ids)
        print(f"encoder fwd ({impl:5s})       {ms:7.3f} ms")


if __name__ == "__main__":
    main()
