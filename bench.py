"""Benchmark: documents/sec/chip for the flagship joint CNN+BERT forward.

Flagship config matches the reference's best SROIE row (readme.md:139):
BERT-base-uncased + ResNet-34-FPN, simplified head, bf16 compute. Shapes
model a typical SROIE receipt after the reference transform
(test_min_size=512, max_size=800 → ~512×384) with one 510-token window and
128 text segments. bs 16 saturates the chip (tools/batch_sweep.py).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "docs/sec/chip", "vs_baseline": N}

``vs_baseline`` divides by an ESTIMATED A100 PyTorch batched-forward
throughput for the same model/shapes (the reference publishes no throughput —
BASELINE.md; the deployment path prints ~100-200 ms/doc single-image on
datacenter GPUs, i.e. ~5-10 docs/s unbatched; batched A100 forward is
estimated at 40 docs/s). The absolute docs/sec/chip number is the durable
metric; the ratio is indicative.
"""

from __future__ import annotations

import json
import time

import jax

ESTIMATED_A100_PYTORCH_DOCS_PER_SEC = 40.0

B, H, W, T, S = 16, 512, 384, 510, 128


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
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
    batch = _make_batch(b=B, h=H, w=W, t=T, s=S, vocab=30522)

    init = jax.jit(
        lambda k, b: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            b, train=False, compute_loss=False, key=jax.random.PRNGKey(2),
        )
    )
    variables = init(jax.random.PRNGKey(0), batch)

    # Timing note: through the tunneled TPU platform, block_until_ready does
    # not synchronize — only a device→host value fetch does. The benchmark
    # therefore runs ITERS forwards inside one on-device fori_loop (each
    # iteration data-dependent on the last) and fetches a single scalar.
    # The fetch itself costs ~29 ms through the tunnel (tools/mxu_calib.py),
    # so ITERS must be large enough to amortise it below the noise floor.
    ITERS = 100

    @jax.jit
    def bench_loop(variables, batch):
        def body(i, carry):
            # Every input leg must be loop-carried, or XLA hoists that branch
            # out of the while loop and the bench under-measures (verified:
            # with constant tokens the whole BERT subgraph is computed once).
            delta = (carry > 1e30).astype(jnp.int32)  # 0 at runtime
            b2 = batch.replace(
                images=batch.images + carry * 1e-9,
                tokens=batch.tokens + delta,
                boxes=batch.boxes + delta,
            )
            out = model.apply(
                variables, b2, train=False, compute_loss=False,
                key=jax.random.PRNGKey(0),
            ).pred_label
            return jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    float(bench_loop(variables, batch))  # compile + warm
    t0 = time.perf_counter()
    float(bench_loop(variables, batch))
    dt = time.perf_counter() - t0

    # one RTT for the scalar fetch is amortized over ITERS batches
    docs_per_sec = B * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "docs/sec/chip joint CNN+BERT forward (SROIE 512x384, bs16)",
                "value": round(docs_per_sec, 2),
                "unit": "docs/sec/chip",
                "vs_baseline": round(
                    docs_per_sec / ESTIMATED_A100_PYTORCH_DOCS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
