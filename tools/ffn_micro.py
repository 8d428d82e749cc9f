"""A/B: fused FFN Pallas kernel vs the XLA einsum path (real chip).

Times (a) the standalone FFN tail and (b) the full BERT-base encoder with
``ffn_impl`` xla vs fused, fwd and fwd+bwd, at bench shapes — the decision
input for flipping the encoder's "auto" gate (models/bert.py). Same timing
discipline as every tool here: on-device fori_loop with loop-carried
inputs, one scalar fetch (docs/ARCHITECTURE.md "Benchmark integrity").

Usage: python tools/ffn_micro.py   (env ITERS=, B=)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("ITERS", "200"))
B = int(os.environ.get("B", "16"))
T = 512
DTYPE = jnp.bfloat16


from tools._timing import make_loop, make_timed

timed = make_timed(ITERS)
loop = make_loop(ITERS)


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from vibertgrid_tpu.models.bert import TextEncoder, TextEncoderConfig
    from vibertgrid_tpu.ops.fused_ffn import ffn_reference, fused_ffn

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    rows = []

    # ---- standalone FFN tail, [B·T, 768] ----
    n, d, f = B * T, 768, 3072
    x = jnp.asarray(rng.standard_normal((n, d)) * 0.5, DTYPE)
    w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(f) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.02, jnp.float32)
    lng = jnp.ones((d,), jnp.float32)
    lnb = jnp.zeros((d,), jnp.float32)
    seed0 = jnp.zeros((), jnp.int32)

    for name, f_ in (
        ("xla", lambda x: ffn_reference(
            x, w1, b1, w2, b2, lng, lnb, seed0, 1e-12, 0.0)),
        ("fused", lambda x: fused_ffn(
            x, w1, b1, w2, b2, lng, lnb, seed0, 1e-12, 0.0)),
    ):
        def fwd(c, x):
            out = f_(x + c.astype(DTYPE) * 0)
            return jnp.mean(out.astype(jnp.float32)) + c * 0.5

        def bwd(c, x):
            g = jax.grad(
                lambda xx: jnp.mean(f_(xx).astype(jnp.float32))
            )(x + c.astype(DTYPE) * 0)
            return jnp.sum(g.astype(jnp.float32)) * 1e-6 + c * 0.5

        rows.append((f"ffn tail fwd      [{name}]", timed(loop(fwd), x)))
        rows.append((f"ffn tail fwd+bwd  [{name}]", timed(loop(bwd), x)))

    # ---- full encoder ----
    ids = jnp.asarray(rng.integers(3, 30000, (B, T)), jnp.int32)
    am = jnp.ones((B, T), jnp.int32)
    base = TextEncoderConfig.base("bert", 30522)
    variables = TextEncoder(base, DTYPE).init(
        {"params": key, "dropout": key}, ids, am
    )

    # EPILOGUE A/B: xla = einsum everywhere; fused-ffn = FFN kernel only
    # (attn epilogue einsum); fused = FFN kernel + fused_proj_ln epilogue.
    variants = (
        ("xla", dict(ffn_impl="xla")),
        ("fused-ffn", dict(ffn_impl="fused", attn_epilogue="xla")),
        ("fused", dict(ffn_impl="fused")),
        # saved-intermediate VJP: grad passes run the kernel + 4-GEMM
        # backward instead of the remat VJP — the fwd+bwd rows decide
        # whether training flips onto the kernel (VERDICT r3 ask #5)
        ("fused-saved", dict(ffn_impl="fused-saved", attn_epilogue="xla")),
    )
    for name, over in variants:
        enc = TextEncoder(dataclasses.replace(base, **over), DTYPE)

        def e_fwd(c, v):
            out = enc.apply(v, ids + (c > 1e30).astype(jnp.int32), am)
            return jnp.mean(out.astype(jnp.float32))

        def e_train(c, v):
            g = jax.grad(
                lambda p: jnp.mean(
                    enc.apply(
                        p, ids + (c > 1e30).astype(jnp.int32), am,
                        deterministic=False, rngs={"dropout": key},
                    ).astype(jnp.float32)
                )
            )(v)
            return (
                jax.tree_util.tree_reduce(
                    lambda a, y: a + jnp.sum(y.astype(jnp.float32)), g, 0.0
                )
                * 1e-12
                + c * 0.5
            )

        rows.append((f"encoder fwd        [{name}]", timed(loop(e_fwd), variables)))
        rows.append((f"encoder fwd+bwd(do)[{name}]", timed(loop(e_train), variables)))

    # numeric cross-check at these shapes (compiled)
    out_x = TextEncoder(dataclasses.replace(base, ffn_impl="xla"), DTYPE).apply(
        variables, ids, am
    )
    out_f = TextEncoder(dataclasses.replace(base, ffn_impl="fused"), DTYPE).apply(
        variables, ids, am
    )
    err = float(
        jnp.max(jnp.abs(out_x.astype(jnp.float32) - out_f.astype(jnp.float32)))
    )

    print(f"\nB={B} T={T} ITERS={ITERS}")
    for name, ms in rows:
        print(f"{name:28s} {ms:8.3f} ms/batch")
    print(f"encoder xla-vs-fused max abs err: {err:.3e}")


if __name__ == "__main__":
    main()
