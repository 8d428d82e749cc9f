"""Optimizer unit tests.

The dual optimizer mirrors the reference's split + hyperparameters
(``/root/reference/train_SROIE.py:215-275``): SGD w/ momentum and coupled
weight decay for the CNN side, AdamW (decoupled wd) for BERT. These tests pin

- SGD against the real ``torch.optim.SGD`` (torch-cpu is in the image),
- the hand-rolled Adam update (used for bf16 state storage) against
  ``optax.scale_by_adam`` when storage is fp32,
- bf16-state trajectories against fp32-state ones (storage-only divergence),
- state tree STRUCTURE invariance across storage dtypes (checkpoints and
  ZeRO-1 shardings partition the same tree either way).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibertgrid_tpu.train.optim import (
    _adamw_scheduled,
    _sgd_with_scheduled_wd,
    make_optimizer,
)

HYP = {
    "optimizer_cnn_hyp": dict(
        learning_rate=1e-2, min_learning_rate=1e-5, warm_up_epoches=0,
        warm_up_init_lr=1e-5, momentum=0.9, weight_decay=5e-4,
        min_weight_decay=5e-4,
    ),
    "optimizer_bert_hyp": dict(
        learning_rate=1e-3, min_learning_rate=1e-7, warm_up_epoches=0,
        warm_up_init_lr=1e-7, beta1=0.9, beta2=0.999, epsilon=1e-8,
        weight_decay=0.01, min_weight_decay=0.01,
    ),
}


def _const(v):
    return lambda step: jnp.asarray(v, jnp.float32)


def _rand_tree(key, shapes, dtype=jnp.float32):
    keys = jax.random.split(key, len(shapes))
    return {
        f"w{i}": jax.random.normal(k, s, dtype)
        for i, (k, s) in enumerate(zip(keys, shapes))
    }


SHAPES = [(4, 8), (8,), (3, 3, 2, 5)]


def _run(tx, params, grads_seq):
    state = tx.init(params)
    for g in grads_seq:
        upd, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    return params


def _grads_seq(n, seed=1):
    out = []
    for i in range(n):
        out.append(_rand_tree(jax.random.PRNGKey(seed + i), SHAPES))
    return out


def test_sgd_matches_torch():
    """fp32-state SGD == torch.optim.SGD(momentum, coupled wd) step for step
    (the reference's CNN optimizer, train_SROIE.py:222-228)."""
    torch = pytest.importorskip("torch")
    lr, wd, mom = 0.01, 5e-4, 0.9
    params = _rand_tree(jax.random.PRNGKey(0), SHAPES)
    grads_seq = _grads_seq(6)

    tx = _sgd_with_scheduled_wd(_const(lr), _const(wd), mom,
                                state_dtype=jnp.float32)
    ours = _run(tx, params, grads_seq)

    tparams = [torch.nn.Parameter(torch.tensor(np.asarray(params[k])))
               for k in sorted(params)]
    opt = torch.optim.SGD(tparams, lr=lr, momentum=mom, weight_decay=wd)
    for g in grads_seq:
        opt.zero_grad()
        for p, k in zip(tparams, sorted(params)):
            p.grad = torch.tensor(np.asarray(g[k]))
        opt.step()
    for p, k in zip(tparams, sorted(params)):
        np.testing.assert_allclose(
            np.asarray(ours[k]), p.detach().numpy(), rtol=2e-6, atol=2e-7
        )


def test_custom_adam_matches_optax_at_fp32():
    """The hand-rolled bias-corrected Adam (taken when state_dtype is set)
    reproduces optax.scale_by_adam exactly when storage is fp32 — so the
    ONLY divergence bf16 storage introduces is the storage rounding."""
    params = _rand_tree(jax.random.PRNGKey(2), SHAPES)
    grads_seq = _grads_seq(6, seed=7)
    ref = _adamw_scheduled(_const(1e-3), _const(0.01), 0.9, 0.999, 1e-8,
                           state_dtype=None)
    custom = _adamw_scheduled(_const(1e-3), _const(0.01), 0.9, 0.999, 1e-8,
                              state_dtype=jnp.float32)
    a = _run(ref, params, grads_seq)
    b = _run(custom, params, grads_seq)
    for k in params:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("make", [
    lambda sd: _sgd_with_scheduled_wd(_const(1e-2), _const(5e-4), 0.9,
                                      state_dtype=sd),
    lambda sd: _adamw_scheduled(_const(1e-3), _const(0.01), 0.9, 0.999,
                                1e-8, state_dtype=sd),
], ids=["sgd", "adamw"])
def test_bf16_state_tracks_fp32(make):
    """bf16 *storage* of momenta (fp32 arithmetic) stays within bf16
    rounding of the fp32-state trajectory over 20 steps."""
    params = _rand_tree(jax.random.PRNGKey(3), SHAPES)
    grads_seq = _grads_seq(20, seed=11)
    a = _run(make(jnp.float32), params, grads_seq)
    b = _run(make(jnp.bfloat16), params, grads_seq)
    for k in params:
        ref = np.asarray(a[k])
        rms = max(float(np.sqrt(np.mean(ref**2))), 1e-3)
        err = np.abs(np.asarray(b[k]) - ref).max() / rms
        # bf16 has ~3 decimal digits; accumulated over 20 steps the max
        # deviation stays well under 1% of the parameter scale.
        assert err < 1e-2, (k, err)


def test_state_tree_structure_invariant():
    """Checkpoint trees and ZeRO-1 shardings see the SAME treedef for bf16
    and fp32 state (only leaf dtypes differ)."""
    params = {"bert_model": _rand_tree(jax.random.PRNGKey(4), SHAPES),
              "backbone": _rand_tree(jax.random.PRNGKey(5), SHAPES)}
    hyp32 = {**HYP, "optimizer_state_dtype": "float32"}
    tx16 = make_optimizer(HYP, num_epochs=2, niter_per_ep=3)
    tx32 = make_optimizer(hyp32, num_epochs=2, niter_per_ep=3)
    s16, s32 = tx16.init(params), tx32.init(params)
    t16 = jax.tree_util.tree_structure(s16)
    t32 = jax.tree_util.tree_structure(s32)
    assert t16 == t32
    # default really is bf16 for the heavy leaves, fp32 keeps fp32
    dt16 = {str(x.dtype) for x in jax.tree_util.tree_leaves(s16)
            if x.ndim > 0}
    dt32 = {str(x.dtype) for x in jax.tree_util.tree_leaves(s32)
            if x.ndim > 0}
    assert dt16 == {"bfloat16"} and dt32 == {"float32"}


def test_make_optimizer_split_routes_bert_to_adam():
    """Params under bert_model get Adam moments; the rest get SGD momentum
    (the reference's name-match split, train_SROIE.py:217-221)."""
    params = {"bert_model": {"w": jnp.ones((4,))},
              "head": {"w": jnp.ones((4,))}}
    tx = make_optimizer(HYP, num_epochs=1, niter_per_ep=1)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(grads, state, params)
    # SGD: -lr*(g + wd*p) on step 0; Adam: -lr*(ghat + wd*p), |ghat|≈1
    sgd_expect = -1e-2 * (1.0 + 5e-4)
    np.testing.assert_allclose(np.asarray(upd["head"]["w"]),
                               sgd_expect, rtol=1e-4)
    adam_mag = float(np.abs(np.asarray(upd["bert_model"]["w"])).max())
    assert 0.5e-3 < adam_mag < 1.5e-3


def test_step_schedule_matches_torch_steplr_recurring():
    """The default lr schedule is the reference's LIVE one: torch
    StepLR(step_size=15, gamma=0.1) stepped once per epoch
    (train_SROIE.py:248-250 + train_val_utils.py:338) — a RECURRING
    x0.1 decay every 15 epochs. Oracle: the live torch scheduler."""
    import torch

    num_epochs, niter = 50, 7
    _, sched = make_optimizer(
        HYP, num_epochs=num_epochs, niter_per_ep=niter, return_schedules=True
    )
    lr = sched["lr_cnn"]

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=HYP["optimizer_cnn_hyp"]["learning_rate"])
    steplr = torch.optim.lr_scheduler.StepLR(opt, step_size=15, gamma=0.1)
    for epoch in range(num_epochs):
        torch_lr = opt.param_groups[0]["lr"]
        # our per-iteration index: epoch*niter + step (matches the
        # reference's iter_; the arrays carry a spare niter+1 tail quirk)
        for it in (0, niter - 1):
            np.testing.assert_allclose(
                lr[epoch * niter + it], torch_lr, rtol=1e-12,
                err_msg=f"epoch {epoch}",
            )
        opt.step()
        steplr.step()


def test_lr_steps_override_is_multisteplr():
    """Explicit `lr_steps` boundaries behave like torch MultiStepLR
    (successive gamma at each milestone) — the long-qualification-run
    override documented in make_optimizer."""
    import torch

    hyp = dict(HYP, lr_steps=[5, 20], lr_gamma=0.5)
    num_epochs, niter = 30, 3
    _, sched = make_optimizer(
        hyp, num_epochs=num_epochs, niter_per_ep=niter, return_schedules=True
    )
    lr = sched["lr_bert"]
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=HYP["optimizer_bert_hyp"]["learning_rate"])
    ms = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[5, 20], gamma=0.5)
    for epoch in range(num_epochs):
        np.testing.assert_allclose(
            lr[epoch * niter], opt.param_groups[0]["lr"], rtol=1e-12,
            err_msg=f"epoch {epoch}",
        )
        opt.step()
        ms.step()
