"""Throughput vs batch size for the flagship forward (and train step)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("ITERS", "100"))


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from __graft_entry__ import _make_batch
    from vibertgrid_tpu.models import ModelConfig, ViBERTgridNet

    cfg = ModelConfig(
        num_classes=5,
        bert_version="bert-base-uncased",
        backbone="resnet_34_fpn",
        classifier_mode="simp",
        compute_dtype=jnp.bfloat16,
    )
    model = ViBERTgridNet(cfg)

    for B in (4, 8, 16, 32):
        batch = _make_batch(b=B, h=512, w=384, t=510, s=128, vocab=30522)
        variables = jax.jit(
            lambda k, b: model.init(
                {"params": k, "dropout": jax.random.PRNGKey(1)},
                b, train=False, compute_loss=False, key=jax.random.PRNGKey(2),
            )
        )(jax.random.PRNGKey(0), batch)

        @jax.jit
        def loop(variables, batch):
            def body(i, c):
                delta = (c > 1e30).astype(jnp.int32)
                b2 = batch.replace(
                    images=batch.images + c * 1e-9,
                    tokens=batch.tokens + delta,
                    boxes=batch.boxes + delta,
                )
                out = model.apply(
                    variables, b2, train=False, compute_loss=False,
                    key=jax.random.PRNGKey(0),
                ).pred_label
                return jnp.mean(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        float(loop(variables, batch))
        t0 = time.perf_counter()
        float(loop(variables, batch))
        dt = time.perf_counter() - t0
        print(f"bs {B:3d}: {B * ITERS / dt:8.1f} docs/s  ({dt / ITERS * 1e3:6.2f} ms/batch)")


if __name__ == "__main__":
    main()
