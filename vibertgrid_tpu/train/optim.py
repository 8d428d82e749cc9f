"""Dual optimizer: SGD for the CNN side, AdamW for BERT.

Mirrors the reference's parameter split and optimizer pair
(``/root/reference/train_SROIE.py:215-235``): parameters under the
``bert_model`` module go to AdamW, everything else to SGD with momentum
(torch-style coupled weight decay: decay added to the gradient *before*
momentum). Learning rates and weight decays follow per-iteration schedule
arrays (StepLR every 15 epochs × 0.1, cosine weight decay —
``train_SROIE.py:248-275``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from vibertgrid_tpu.train.schedules import (
    array_schedule,
    cosine_scheduler,
    step_scheduler,
)


def _sgd_with_scheduled_wd(lr_schedule, wd_schedule, momentum: float):
    """torch.optim.SGD semantics: grad += wd * param, then momentum buffer
    b = momentum * b + grad, update = -lr * b."""

    def init(params):
        return {
            "momentum": jax.tree_util.tree_map(jnp.zeros_like, params),
            "count": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params):
        step = state["count"]
        lr = lr_schedule(step)
        wd = wd_schedule(step)
        g = jax.tree_util.tree_map(lambda gr, p: gr + wd * p, grads, params)
        buf = jax.tree_util.tree_map(
            lambda b, gr: momentum * b + gr, state["momentum"], g
        )
        updates = jax.tree_util.tree_map(lambda b: -lr * b, buf)
        return updates, {"momentum": buf, "count": step + 1}

    return optax.GradientTransformation(init, update)


def _adamw_scheduled(lr_schedule, wd_schedule, b1, b2, eps):
    """AdamW with scheduled lr and (decoupled) weight decay."""

    def init(params):
        return {
            "adam": optax.scale_by_adam(b1=b1, b2=b2, eps=eps).init(params),
            "count": jnp.zeros((), jnp.int32),
        }

    adam = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)

    def update(grads, state, params):
        step = state["count"]
        lr = lr_schedule(step)
        wd = wd_schedule(step)
        upd, adam_state = adam.update(grads, state["adam"], params)
        updates = jax.tree_util.tree_map(
            lambda u, p: -lr * (u + wd * p), upd, params
        )
        return updates, {"adam": adam_state, "count": step + 1}

    return optax.GradientTransformation(init, update)


def param_group_label(path: tuple, _leaf=None) -> str:
    """'bert' for params under the bert_model module, else 'cnn' — the split
    at train_SROIE.py:217-221 (name match on 'bert_model')."""
    keys = [getattr(k, "key", str(k)) for k in path]
    return "bert" if "bert_model" in keys else "cnn"


def make_optimizer(
    hyp: dict,
    num_epochs: int,
    niter_per_ep: int,
    return_schedules: bool = False,
):
    """Build the dual optimizer from a reference-compatible YAML dict
    (``example_config.yaml:16-34``).

    ``return_schedules=True`` additionally returns the per-iteration
    lr/wd arrays (``{"lr_cnn", "wd_cnn", "lr_bert", "wd_bert"}``) for the
    per-iteration console/TB log (``train_val_utils.py:215-246, 293-335``) —
    they are pure host-side functions of the step, so logging them costs no
    device sync."""
    cnn = hyp["optimizer_cnn_hyp"]
    bert = hyp["optimizer_bert_hyp"]

    lr_cnn = step_scheduler(
        base_value=cnn["learning_rate"], steps=[15], gamma=0.1,
        num_epoches=num_epochs, niter_per_ep=niter_per_ep,
        warmup_epoches=cnn.get("warm_up_epoches", 0),
        start_warmup_value=cnn.get("warm_up_init_lr", 0.0),
    )
    wd_cnn = cosine_scheduler(
        base_value=cnn["weight_decay"], final_value=cnn["min_weight_decay"],
        epoches=num_epochs, niter_per_ep=niter_per_ep,
    )
    lr_bert = step_scheduler(
        base_value=bert["learning_rate"], steps=[15], gamma=0.1,
        num_epoches=num_epochs, niter_per_ep=niter_per_ep,
        warmup_epoches=bert.get("warm_up_epoches", 0),
        start_warmup_value=bert.get("warm_up_init_lr", 0.0),
    )
    wd_bert = cosine_scheduler(
        base_value=bert["weight_decay"], final_value=bert["min_weight_decay"],
        epoches=num_epochs, niter_per_ep=niter_per_ep,
    )

    sgd = _sgd_with_scheduled_wd(
        array_schedule(lr_cnn), array_schedule(wd_cnn), cnn.get("momentum", 0.9)
    )
    adamw = _adamw_scheduled(
        array_schedule(lr_bert),
        array_schedule(wd_bert),
        bert.get("beta1", 0.9),
        bert.get("beta2", 0.999),
        bert.get("epsilon", 1e-8),
    )
    tx = optax.multi_transform(
        {"cnn": sgd, "bert": adamw},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: param_group_label(path), params
        ),
    )
    if return_schedules:
        return tx, {
            "lr_cnn": lr_cnn,
            "wd_cnn": wd_cnn,
            "lr_bert": lr_bert,
            "wd_bert": wd_bert,
        }
    return tx
