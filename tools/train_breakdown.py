"""Train-step time breakdown on the real TPU chip.

Times, with the on-device fori_loop + scalar-fetch technique (bench.py's
timing note applies: through the tunneled platform only a device→host fetch
synchronizes), the flagship SROIE train configuration at bench shapes:

  1. inference forward (no losses)          — bench.py's number
  2. train forward incl. aux seg head loss  — adds seg head + OHEM cost
  3. forward + backward (grads only)        — adds the bwd pass
  4. full train step (dual optimizer)       — adds optimizer + BN update

Differences between consecutive rows localize the time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("ITERS", "100"))


from tools._timing import make_timed

timed = make_timed(ITERS)


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from __graft_entry__ import _make_batch
    from vibertgrid_tpu.models import ModelConfig, ViBERTgridNet
    from vibertgrid_tpu.train import create_train_state, make_optimizer, make_train_step

    import os as _os
    B = int(_os.environ.get("BENCH_B", "8"))
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
    def fwd_loss(state, batch):
        def body(i, c):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                carry_batch(batch, c), train=True, compute_loss=True,
                key=jax.random.PRNGKey(0),
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )[0]
            return out.total_loss.astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    @jax.jit
    def fwd_bwd(state, batch):
        def body(i, c):
            def loss_fn(params):
                out = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    carry_batch(batch, c), train=True, compute_loss=True,
                    key=jax.random.PRNGKey(0),
                    rngs={"dropout": jax.random.PRNGKey(1)},
                    mutable=["batch_stats"],
                )[0]
                return out.total_loss
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            import optax
            return loss + 0.0 * optax.global_norm(grads)
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    @jax.jit
    def full_step(state, batch, key):
        def body(i, carry):
            st, c = carry
            st2, loss = train_step(st, carry_batch(batch, c), key)
            return (st2, loss.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, (state, 0.0))[1]

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    rows = [
        ("inference fwd (no loss)", lambda: timed(fwd_infer, variables, batch)),
        ("train fwd + losses", lambda: timed(fwd_loss, state, batch)),
        ("fwd + bwd (grads)", lambda: timed(fwd_bwd, state, batch)),
        ("full train step", lambda: timed(full_step, state, batch,
                                          jax.random.PRNGKey(0))),
    ]
    prev = 0.0
    for name, f in rows:
        ms = f()
        print(f"{name:28s} {ms:8.2f} ms/batch   (+{ms - prev:6.2f})")
        prev = ms


if __name__ == "__main__":
    main()
