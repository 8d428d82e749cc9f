"""End-to-end model tests on tiny shapes (CPU).

Model setup is shared per classifier mode (functools.cache) and init/apply
are jitted so the persistent compilation cache amortizes the single-core XLA
compiles across runs.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vibertgrid_tpu.models import ModelConfig, ViBERTgridNet
from vibertgrid_tpu.models.vibertgrid import Batch

B, H, W, T, S = 2, 32, 32, 510, 8


def tiny_config(**kw):
    defaults = dict(
        num_classes=5,
        bert_version="tiny-bert-test",
        backbone="resnet_18_fpn",
        classifier_mode="simp",
        num_hard_positive_main_1=2,
        num_hard_negative_main_1=2,
        num_hard_positive_main_2=2,
        num_hard_negative_main_2=2,
        loss_aux_sample_list=[16, 32, 16],
        num_hard_positive_aux=8,
        num_hard_negative_aux=8,
        ohem_random=True,
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


def tiny_batch(seed=0):
    rng = np.random.default_rng(seed)
    boxes = []
    for _ in range(B):
        x0 = rng.integers(0, W - 16, S)
        y0 = rng.integers(0, H - 16, S)
        boxes.append(
            np.stack([x0, y0, x0 + rng.integers(4, 16, S), y0 + rng.integers(4, 8, S)], 1)
        )
    n_tok = 40
    seg_ids = np.sort(rng.integers(0, S, (B, n_tok)), axis=1)
    seg_ids = np.pad(seg_ids, ((0, 0), (0, T - n_tok)))
    token_mask = np.zeros((B, T), np.int32)
    token_mask[:, :n_tok] = 1
    return Batch(
        images=jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32),
        tokens=jnp.asarray(rng.integers(3, 500, (B, T)), jnp.int32),
        token_mask=jnp.asarray(token_mask),
        seg_ids=jnp.asarray(seg_ids, jnp.int32),
        boxes=jnp.asarray(np.stack(boxes), jnp.int32),
        box_mask=jnp.asarray(np.ones((B, S), bool)),
        seg_classes=jnp.asarray(rng.integers(0, 5, (B, S)), jnp.int32),
    )


def init_model(cfg, batch):
    model = ViBERTgridNet(cfg)
    init = jax.jit(
        functools.partial(model.init, train=True, compute_loss=True),
        static_argnames=(),
    )
    variables = init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        key=jax.random.PRNGKey(2),
    )
    return model, variables


def apply_train(model, variables, batch, key=3, dkey=4):
    fn = jax.jit(
        functools.partial(
            model.apply, train=True, compute_loss=True, mutable=["batch_stats"]
        )
    )
    return fn(
        variables,
        batch,
        key=jax.random.PRNGKey(key),
        rngs={"dropout": jax.random.PRNGKey(dkey)},
    )


def apply_eval(model, variables, batch, compute_loss=True, key=5):
    fn = jax.jit(
        functools.partial(
            model.apply, train=False, compute_loss=compute_loss
        )
    )
    return fn(variables, batch, key=jax.random.PRNGKey(key))


@functools.cache
def setup(mode):
    kw = {}
    if mode == "crf":
        kw["tag_to_idx"] = {"O": 0, "B-a": 1, "B-b": 2, "B-c": 3, "B-d": 4}
    if mode == "noohem":
        cfg = tiny_config(classifier_mode="simp", ohem_random=False)
    else:
        cfg = tiny_config(classifier_mode=mode, **kw)
    batch = tiny_batch()
    model, variables = init_model(cfg, batch)
    return cfg, batch, model, variables


@pytest.mark.parametrize("mode", ["simp", "full", "crf"])
def test_forward_modes(mode):
    cfg, batch, model, variables = setup(mode)

    out, mutated = apply_train(model, variables, batch)
    assert np.isfinite(float(out.total_loss))
    assert out.gt_label.shape == (B, S)
    if mode == "crf":
        assert out.pred_label.shape == (B, S, 7)  # emission feats in train
    else:
        assert out.pred_label.shape == (B, S, 5)
        assert np.all(np.isfinite(np.asarray(out.pred_label)))

    # eval path
    out_eval = apply_eval(model, variables, batch)
    assert np.isfinite(float(out_eval.total_loss))
    if mode == "crf":
        assert out_eval.pred_label.shape == (B, S)  # decoded tags
        tags = np.asarray(out_eval.pred_label)
        assert tags.min() >= 0 and tags.max() < 7

    # inference path (no losses, no aux head)
    out_inf = apply_eval(model, variables, batch, compute_loss=False)
    assert out_inf.total_loss is None
    assert out_inf.pred_mask is None


def test_gradients_flow():
    cfg, batch, model, variables = setup("simp")
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **others},
            batch,
            train=True,
            compute_loss=True,
            key=jax.random.PRNGKey(3),
            rngs={"dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        return out.total_loss

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # Every major branch receives gradient.
    norms = {
        k: float(
            sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(grads[k]))
        )
        for k in grads
    }
    for branch in ["bert_model", "backbone", "late_fusion", "field_type_head"]:
        assert norms[branch] > 0, f"no gradient into {branch}: {norms}"


def test_multi_window_long_corpus():
    """Corpora beyond 510 tokens fold into extra windows; a segment spanning
    the window boundary must still aggregate across both windows (the
    reference re-concatenates windows before aggregation,
    model/BERTgrid_generator.py:146-191)."""
    cfg, batch, model, variables = setup("noohem")
    t2 = 2 * 510
    rng = np.random.default_rng(5)
    tokens = np.zeros((B, t2), np.int32)
    token_mask = np.zeros((B, t2), np.int32)
    seg_ids = np.zeros((B, t2), np.int32)
    n_tok = 600  # crosses the 510 boundary
    tokens[:, :n_tok] = rng.integers(3, 500, (B, n_tok))
    token_mask[:, :n_tok] = 1
    # segment S-1 spans tokens 500..599 (both windows)
    per_seg = n_tok // S
    ids = np.repeat(np.arange(S), per_seg)[:n_tok]
    ids = np.sort(ids)
    seg_ids[:, :n_tok] = ids
    batch2 = batch.replace(
        tokens=jnp.asarray(tokens),
        token_mask=jnp.asarray(token_mask),
        seg_ids=jnp.asarray(seg_ids),
    )
    out = apply_eval(model, variables, batch2, compute_loss=False)
    pred = np.asarray(out.pred_label)
    assert pred.shape == (B, S, 5)
    assert np.all(np.isfinite(pred))


def test_masked_segments_do_not_affect_valid_preds():
    cfg, batch, model, variables = setup("noohem")

    mask2 = np.ones((B, S), bool)
    mask2[:, S // 2 :] = False
    batch2 = batch.replace(box_mask=jnp.asarray(mask2))
    out_a = apply_eval(model, variables, batch2, compute_loss=False, key=0)
    # Scramble the *masked* segments' classes and boxes — valid preds should
    # shift only through the BERTgrid/backbone if boxes change, so scramble
    # classes only (classes affect losses, not preds).
    cls2 = np.asarray(batch.seg_classes).copy()
    cls2[:, S // 2 :] = 3
    batch3 = batch2.replace(seg_classes=jnp.asarray(cls2))
    out_b = apply_eval(model, variables, batch3, compute_loss=False, key=0)
    np.testing.assert_allclose(
        np.asarray(out_a.pred_label)[:, : S // 2],
        np.asarray(out_b.pred_label)[:, : S // 2],
        rtol=1e-5,
    )


def test_all_backbone_registry_entries_run():
    """Every entry of the 6-backbone registry (ref ViBERTgrid_net.py:282-316)
    initialises and runs a forward at tiny shapes."""
    from vibertgrid_tpu.models.resnet_fpn import BACKBONE_REGISTRY, ResNetFPN

    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    grid = jnp.zeros((1, 8, 8, 16), jnp.float32)
    for name, kw in BACKBONE_REGISTRY.items():
        bk = ResNetFPN(pyramid_channels=32, fuse_channels=32, **kw)
        v = bk.init(rng, img, grid, False)
        out = bk.apply(v, img, grid, False)
        assert out.shape == (1, 16, 16, 32), (name, out.shape)


def test_all_bert_registry_entries_resolve():
    """Every entry of the 7-model registry (ref ViBERTgrid_net.py:218-226)
    resolves to a consistent TextEncoderConfig."""
    from vibertgrid_tpu.models.bert import BERT_MODEL_REGISTRY
    from vibertgrid_tpu.models.vibertgrid import ModelConfig

    for name, (hidden, flavor) in BERT_MODEL_REGISTRY.items():
        cfg = ModelConfig(num_classes=5, bert_version=name)
        tc = cfg.resolved_text_config()
        assert tc.hidden_size == hidden, name
        assert tc.flavor == flavor, name
        if flavor == "roberta":
            assert tc.pad_token_id == 1


def test_eval_cli_evaluate_smoke(tmp_path):
    """eval.cli.evaluate runs the bs-1 test loop + entity join + JSON report
    on the synthetic dataset with a fresh state."""
    from vibertgrid_tpu.data.synthetic import (
        make_synthetic_root,
        make_test_tokenizer,
        synthetic_spec,
    )
    from vibertgrid_tpu.eval.cli import evaluate
    from tests.test_train_driver import tiny_hyp

    from vibertgrid_tpu.data.synthetic import make_synthetic_root as _msr
    from vibertgrid_tpu.train.checkpoint import CheckpointManager
    from vibertgrid_tpu.train.driver import build_all, build_tokenizer
    from vibertgrid_tpu.train.optim import make_optimizer
    from vibertgrid_tpu.train.state import create_train_state
    from vibertgrid_tpu.data import KIEDataset, data_loader

    root = str(tmp_path / "data")
    make_synthetic_root(root, n_train=2, n_test=2, seed=0)
    hyp = tiny_hyp(root)
    hyp["result_dir"] = str(tmp_path / "result")

    # save a fresh-state checkpoint the CLI can load (eval requires weights,
    # mirroring eval_SROIE.py:333-340)
    spec = synthetic_spec()
    tokenizer = build_tokenizer(hyp)
    spec2, cfg, model, transform, collator, _ = build_all(
        hyp, spec.name, tokenizer, spec
    )
    test_ds = KIEDataset(root + "/test", spec2, tokenizer, train=False)
    sample, _ = next(iter(data_loader(test_ds, collator, 1, train=False)))
    optimizer = make_optimizer(hyp, 1, 1)
    state = create_train_state(model, optimizer, sample, seed=0)
    ckpt = CheckpointManager(str(tmp_path / "w"))
    path = ckpt.save(state, tag="smoke")
    hyp["weights"] = path

    results = evaluate(hyp, "sroie", spec=synthetic_spec())
    assert "primary_F1" in results and np.isfinite(results["primary_F1"])
    import os as _os
    assert _os.path.exists(_os.path.join(hyp["result_dir"], "smoke.json"))

    # same checkpoint over the uint8 wire + batched loader: the CLI's
    # eval_uint8_upload path must land within the quantization tolerance
    # of the fp32 bs-1 protocol (parity mechanics pinned in
    # test_data_eval.py::test_uint8_eval_wire_matches_fp32)
    hyp_u8 = dict(hyp, eval_uint8_upload=True, eval_batch_size=2)
    results_u8 = evaluate(hyp_u8, "sroie", spec=synthetic_spec())
    assert results_u8["primary_F1"] == pytest.approx(
        results["primary_F1"], abs=0.05
    )


def test_full_head_standalone_learnability():
    """The two-stage head trained standalone on separable features:

    - under the paper-intent ``decision="gated"`` rule it classifies
      (argmax accuracy ≥ 0.95);
    - under the reference's ``decision="reference"`` rule the SAME
      training run collapses to all-background once the gate and class
      sigmoids saturate to 1.0f and the argmax tie breaks to index 0
      (ref field_type_classification_head.py:376-381 +
      train_val_utils.py:446-447) — the documented reason full-head
      convergence is qualified with the gated rule
      (tools/convergence_run.py --config full).
    """
    import optax

    from vibertgrid_tpu.models.heads import FieldTypeClassification

    C, N, D = 5, 256, 32
    rng = np.random.default_rng(0)
    protos = rng.standard_normal((C, D)).astype(np.float32) * 2.0
    labels = rng.integers(0, C, N).astype(np.int32)
    feats = protos[labels] + 0.1 * rng.standard_normal((N, D)).astype(
        np.float32
    )
    valid = np.ones(N, bool)

    def train_head(decision):
        head = FieldTypeClassification(
            num_classes=C, layer_mode="single",
            num_hard_positive_1=8, num_hard_negative_1=8,
            num_hard_positive_2=8, num_hard_negative_2=8,
            decision=decision,
        )
        key = jax.random.PRNGKey(0)
        params = head.init(
            key, feats, labels, valid, train=True, compute_loss=True, key=key
        )
        tx = optax.sgd(0.5, momentum=0.9)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, k):
            def loss_fn(p):
                loss, _, _ = head.apply(
                    p, feats, labels, valid,
                    train=True, compute_loss=True, key=k,
                )
                return loss

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, loss

        for _ in range(200):
            key, k = jax.random.split(key)
            params, opt, _ = step(params, opt, k)
        _, _, pred = head.apply(
            params, feats, labels, valid,
            train=False, compute_loss=False, key=key,
        )
        return float((np.asarray(pred).argmax(-1) == labels).mean())

    acc_gated = train_head("gated")
    acc_ref = train_head("reference")
    background_share = float((labels == 0).mean())
    assert acc_gated >= 0.95, acc_gated
    # the reference rule's saturation collapse: all predictions background
    assert acc_ref <= background_share + 0.05, acc_ref
