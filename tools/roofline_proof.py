"""Whole-program roofline proof for the flagship train step.

Compiles the EXACT jitted programs that tools/train_breakdown.py times
(same shapes, same fori_loop wrappers so fusion decisions match), pulls
XLA's `cost_analysis()` bytes/FLOPs for each, and divides by the measured
wall time to print achieved HBM bandwidth and MXU utilization next to the
v5e peaks (810 GB/s; 186.8 TF/s bf16 measured on an 8192^3 matmul at
ITERS=400, tools/matmul_sweep.py — the earlier 167 TF/s figure was
fetch-overhead-inflated at ITERS=40).

MEASUREMENT RULE (learned the hard way): the ~29 ms tunnel fetch divides
over ITERS, so every per-iteration number carries +29/ITERS ms. At the
old ITERS=20 that was +1.45 ms per number — enough to invent a fake
"30 TF/s matmul cliff" at BERT shapes. Keep ITERS >= 100 (CLAUDE.md).

The claim being proven/refuted: the train step is HBM-bound and runs at
the roofline, so further optimization must REDUCE BYTES (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("ITERS", "100"))
HBM_PEAK_GBS = 810.0
MXU_PEAK_TFS = 186.8


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from __graft_entry__ import _make_batch
    from vibertgrid_tpu.models import ModelConfig, ViBERTgridNet
    from vibertgrid_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    B = int(os.environ.get("BENCH_B", "8"))
    H, W, T, S = 512, 384, 510, 128
    cfg = ModelConfig(
        num_classes=5,
        bert_version="bert-base-uncased",
        backbone="resnet_34_fpn",
        classifier_mode="simp",
        compute_dtype=jnp.bfloat16,
        num_hard_positive_main_1=32,
        num_hard_negative_main_1=32,
        num_hard_positive_main_2=32,
        num_hard_negative_main_2=32,
        loss_aux_sample_list=[64, 128, 64],
        num_hard_positive_aux=512,
        num_hard_negative_aux=512,
    )
    model = ViBERTgridNet(cfg)
    batch = _make_batch(b=B, h=H, w=W, t=T, s=S, vocab=30522)
    hyp = {
        "optimizer_cnn_hyp": dict(
            learning_rate=0.005, min_learning_rate=1e-6, warm_up_epoches=0,
            warm_up_init_lr=1e-6, momentum=0.9, weight_decay=5e-4,
            min_weight_decay=5e-4,
        ),
        "optimizer_bert_hyp": dict(
            learning_rate=5e-5, min_learning_rate=1e-8, warm_up_epoches=0,
            warm_up_init_lr=1e-8, beta1=0.9, beta2=0.999, epsilon=1e-8,
            weight_decay=0.01, min_weight_decay=0.01,
        ),
    }
    optimizer = make_optimizer(hyp, num_epochs=2, niter_per_ep=100)
    state = create_train_state(model, optimizer, batch, seed=0)
    train_step = make_train_step(model, optimizer)

    def carry_batch(batch, carry):
        delta = (carry > 1e30).astype(jnp.int32)
        return batch.replace(
            images=batch.images + carry * 1e-9,
            tokens=batch.tokens + delta,
            boxes=batch.boxes + delta,
        )

    @jax.jit
    def fwd_infer(variables, batch):
        def body(i, c):
            out = model.apply(
                variables, carry_batch(batch, c), train=False,
                compute_loss=False, key=jax.random.PRNGKey(0),
            ).pred_label
            return jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    @jax.jit
    def full_step(state, batch, key):
        def body(i, carry):
            st, c = carry
            st2, loss = train_step(st, carry_batch(batch, c), key)
            return (st2, loss.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, (state, 0.0))[1]

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # Single-iteration programs for unambiguous cost analysis (XLA's
    # cost_analysis counts a while-loop body ONCE regardless of trip count,
    # so the looped timing programs can't be used for bytes).
    @jax.jit
    def fwd_once(variables, batch):
        out = model.apply(
            variables, batch, train=False, compute_loss=False,
            key=jax.random.PRNGKey(0),
        ).pred_label
        return jnp.mean(out.astype(jnp.float32))

    @jax.jit
    def step_once(state, batch, key):
        st2, loss = train_step(state, batch, key)
        return st2, loss

    def cost(fn, *args):
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return ca.get("bytes accessed", 0) / 1e9, ca.get("flops", 0) / 1e9

    from tools._timing import make_timed

    timed = make_timed(ITERS)

    def report(name, ms, gb, gflop):
        bw = gb / (ms / 1e3)
        tf = gflop / ms
        print(
            f"{name:22s} {ms:7.2f} ms  {gb:6.2f} GB  {gflop:7.1f} GFLOP"
            f"  -> {bw:6.1f} GB/s ({bw / HBM_PEAK_GBS * 100:5.1f}% HBM)"
            f"   {tf:6.1f} TF/s ({tf / MXU_PEAK_TFS * 100:5.1f}% MXU)"
        )

    print(f"batch={B}  image={H}x{W}  tokens={T}  segments={S}  "
          f"peaks: {HBM_PEAK_GBS:.0f} GB/s HBM, {MXU_PEAK_TFS:.0f} TF/s MXU")
    gb, gf = cost(fwd_once, variables, batch)
    ms = timed(fwd_infer, variables, batch)
    report("inference fwd", ms, gb, gf)
    gb, gf = cost(step_once, state, batch, jax.random.PRNGKey(0))
    ms = timed(full_step, state, batch, jax.random.PRNGKey(0))
    report("full train step", ms, gb, gf)


if __name__ == "__main__":
    main()
