"""Data/tensor-parallel training over the virtual 8-device CPU mesh.

Validates the TPU-native replacement of the reference's DDP stack: gradient
and BN-stat reductions over the sharded batch must reproduce single-device
results (the correctness property DDP+SyncBN provides), and the tensor-
parallel BERT shardings must compile and run.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vibertgrid_tpu.models import ModelConfig, ViBERTgridNet
from vibertgrid_tpu.models.vibertgrid import Batch
from vibertgrid_tpu.parallel import make_mesh, replicate, shard_batch
from vibertgrid_tpu.parallel.sharding import apply_shardings
from vibertgrid_tpu.train import make_train_step, create_train_state, make_optimizer

from tests.test_model import tiny_config, tiny_batch  # noqa: F401

HYP = {
    "optimizer_cnn_hyp": dict(
        learning_rate=1e-3, min_learning_rate=1e-5, warm_up_epoches=0,
        warm_up_init_lr=1e-5, momentum=0.9, weight_decay=0.0005,
        min_weight_decay=0.0005,
    ),
    "optimizer_bert_hyp": dict(
        learning_rate=1e-4, min_learning_rate=1e-7, warm_up_epoches=0,
        warm_up_init_lr=1e-7, beta1=0.9, beta2=0.999, epsilon=1e-8,
        weight_decay=0.01, min_weight_decay=0.01,
    ),
}


def big_batch(b=8, seed=0):
    """Stack tiny batches to batch size b."""
    base = tiny_batch(seed)
    reps = b // base.images.shape[0]
    return jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * reps, axis=0), base
    )


@functools.cache
def setup_train(smooth=False):
    if smooth:
        # No hard-example mining: the loss is a smooth function of the global
        # batch, so data-parallel must match single-device bit-for-float.
        # (With OHEM, top-k selection can flip on reduction-order ties —
        # and the reference's DDP mines per replica anyway.)
        cfg = tiny_config(
            ohem_random=False,
            num_hard_positive_main_1=-1, num_hard_negative_main_1=-1,
            num_hard_positive_main_2=-1, num_hard_negative_main_2=-1,
            loss_aux_sample_list=None,
            num_hard_positive_aux=-1, num_hard_negative_aux=-1,
        )
    else:
        cfg = tiny_config(ohem_random=False)
    batch = big_batch()
    model = ViBERTgridNet(cfg)
    optimizer = make_optimizer(HYP, num_epochs=3, niter_per_ep=4)
    state = create_train_state(model, optimizer, batch, seed=0)
    step_fn = make_train_step(model, optimizer)
    return model, optimizer, state, step_fn, batch


def test_dp_loss_and_grads_match_single_device():
    model, optimizer, state, step_fn, batch = setup_train(smooth=True)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def loss_and_grads(st, bt):
        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": st.batch_stats},
                bt, train=True, compute_loss=True,
                key=jax.random.PRNGKey(7),
                rngs={"dropout": jax.random.PRNGKey(8)},
                mutable=["batch_stats"],
            )
            return out.total_loss
        return jax.value_and_grad(loss_fn)(st.params)

    loss1, g1 = loss_and_grads(state, batch)

    mesh = make_mesh(data=8, model=1)
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    loss8, g8 = loss_and_grads(state_r, batch_s)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
        # Reduction order differs between the single-device and 8-shard sums,
        # and BatchNorm's E[x²]−E[x]² variance amplifies that float noise in
        # backbone grads — check magnitude + direction, not bitwise equality.
        a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na * nb > 1e-12:
            assert abs(na - nb) / max(na, nb) < 1e-2, (na, nb)
            cos = float(np.dot(a, b) / (na * nb))
            assert cos > 0.999, cos
        else:
            np.testing.assert_allclose(a, b, atol=1e-6)


def test_dp_multiple_steps_and_loss_decreases():
    model, optimizer, state, step_fn, batch = setup_train(smooth=True)
    mesh = make_mesh(data=8, model=1)
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        state, loss = step_fn(state, batch, key)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_tp_dp_mesh_runs():
    model, optimizer, state, step_fn, batch = setup_train()
    mesh = make_mesh(data=4, model=2)
    params = apply_shardings(state.params, mesh)
    state = state.replace(
        params=params,
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
        step=state.step,
    )
    batch = shard_batch(batch, mesh)
    state2, loss = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # Sharded kernels keep their sharding through the update.
    qk = state2.params["bert_model"]["layer_0"]["attention"]["query"]["kernel"]
    assert "model" in str(qk.sharding.spec)


def test_zero1_opt_state_sharding_matches_replicated():
    """ZeRO-1: sharded optimizer state must produce the same update as the
    replicated baseline, stay sharded across steps, and actually shard the
    large leaves."""
    from vibertgrid_tpu.parallel.sharding import (
        optimizer_state_shardings,
        shard_optimizer_state,
    )

    model, optimizer, state, step_fn, batch = setup_train(smooth=True)
    mesh = make_mesh(data=8, model=1)
    key = jax.random.PRNGKey(3)

    state_rep = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    step_rep = make_train_step(model, optimizer)
    ref_state, ref_loss = step_rep(state_rep, batch_s, key)
    ref_state, ref_loss2 = step_rep(ref_state, batch_s, key)

    shardings = optimizer_state_shardings(state.opt_state, mesh, min_size=128)
    z_state = replicate(state, mesh)
    z_state = z_state.replace(
        opt_state=shard_optimizer_state(state.opt_state, mesh, min_size=128)
    )
    step_z = make_train_step(model, optimizer, opt_state_shardings=shardings)
    z_state, z_loss = step_z(z_state, batch_s, key)
    z_state, z_loss2 = step_z(z_state, batch_s, key)

    np.testing.assert_allclose(float(z_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(z_loss2), float(ref_loss2), rtol=2e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.params),
        jax.tree_util.tree_leaves(z_state.params),
    ):
        # Resharding the optimizer state changes collective/reduction order;
        # BatchNorm amplifies that float noise (see the DP-vs-single-device
        # test above), so compare with an absolute floor that covers two
        # lr-scaled update steps on zero-init bias leaves.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
        )

    # large leaves sharded over 'data' and still sharded after two steps
    from jax.sharding import PartitionSpec as P

    n_sharded = 0
    for leaf, sh in zip(
        jax.tree_util.tree_leaves(z_state.opt_state),
        jax.tree_util.tree_leaves(
            optimizer_state_shardings(z_state.opt_state, mesh, min_size=128)
        ),
    ):
        if sh.spec != P():
            n_sharded += 1
            assert "data" in str(leaf.sharding.spec), (
                leaf.shape,
                leaf.sharding,
            )
    assert n_sharded > 0
