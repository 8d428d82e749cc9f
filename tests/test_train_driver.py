"""End-to-end training-driver smoke test on the synthetic dataset (CPU)."""

import numpy as np
import pytest

from vibertgrid_tpu.data.synthetic import (
    make_synthetic_root,
    make_test_tokenizer,
    synthetic_spec,
)
from vibertgrid_tpu.train.driver import train


def tiny_hyp(root, weights=""):
    return {
        "comment": "synthetic-smoke",
        "tee_logs": False,
        # Single-device mesh: the driver's default (all 8 virtual devices)
        # makes every smoke run its heavy train-step graph with 8 collective
        # threads on the ONE-core sandbox — the grounded XLA:CPU rendezvous
        # SIGABRT trigger (CLAUDE.md; killed the canonical suite in r3).
        # Multi-device driver semantics stay covered by the zero1 smoke
        # (mesh_data=2) and test_parallel_train's DP-equivalence proofs.
        "mesh_data": 1,
        "mesh_model": 1,
        "data_root": root,
        "tokenizer_path": f"{root}/vocab.txt",
        "batch_size": 2,
        "start_epoch": 0,
        "end_epoch": 2,
        "num_classes": 5,
        "bert_version": "tiny-bert-test",
        "backbone": "resnet_18_fpn",
        "classifier_mode": "simp",
        "eval_mode": "seq_and_str",
        "tag_mode": "B",
        "layer_mode": "single",
        "image_min_size": [256],
        "test_image_min_size": 256,
        "image_max_size": 400,
        "image_mean": [0.9, 0.9, 0.9],
        "image_std": [0.15, 0.15, 0.15],
        "num_hard_positive_main_1": 8,
        "num_hard_negative_main_1": 8,
        "num_hard_positive_main_2": 8,
        "num_hard_negative_main_2": 8,
        "loss_aux_sample_list": [64, 128, 64],
        "num_hard_positive_aux": 32,
        "num_hard_negative_aux": 32,
        "ohem_random": False,
        "loss_control_lambda": 1.0,
        "add_pos_neg": True,
        "weights": weights,
        "optimizer_cnn_hyp": dict(
            learning_rate=1e-3, min_learning_rate=1e-5, warm_up_epoches=0,
            warm_up_init_lr=1e-5, momentum=0.9, weight_decay=5e-4,
            min_weight_decay=5e-4,
        ),
        "optimizer_bert_hyp": dict(
            learning_rate=1e-4, min_learning_rate=1e-7, warm_up_epoches=0,
            warm_up_init_lr=1e-7, beta1=0.9, beta2=0.999, epsilon=1e-8,
            weight_decay=0.01, min_weight_decay=0.01,
        ),
    }


def test_train_driver_smoke(tmp_path):
    root = str(tmp_path / "data")
    make_synthetic_root(root, n_train=4, n_test=2, seed=0)
    # tokenizer built from the synthetic vocab written by make_synthetic_root
    hyp = tiny_hyp(root)
    hyp["save_top"] = str(tmp_path / "weights")
    hyp["save_log"] = str(tmp_path / "log")

    results = train(hyp, "sroie", spec=synthetic_spec(), max_steps=4)
    assert "primary_F1" in results and np.isfinite(results["primary_F1"])
    assert results["loss"] is None or np.isfinite(results["loss"])

    # resume from the saved checkpoint
    import os

    ckpts = [e for e in os.listdir(hyp["save_top"]) if e.startswith("epoch")]
    assert ckpts, "no checkpoint saved"
    hyp2 = tiny_hyp(root, weights=os.path.join(hyp["save_top"], ckpts[0]))
    hyp2["save_top"] = str(tmp_path / "weights2")
    hyp2["save_log"] = str(tmp_path / "log2")
    hyp2["end_epoch"] = 3
    results2 = train(hyp2, "sroie", spec=synthetic_spec(), max_steps=2)
    assert np.isfinite(results2["primary_F1"])


def test_train_driver_crf_bio_smoke(tmp_path):
    """The CRF classifier + BIO tag path end-to-end: train a couple of steps
    and validate with seqeval (the only metric the CRF head supports,
    train_SROIE.py:134-137)."""
    root = str(tmp_path / "data")
    make_synthetic_root(root, n_train=4, n_test=2, seed=3)
    hyp = tiny_hyp(root)
    hyp.update(
        save_top=str(tmp_path / "w"),
        save_log=str(tmp_path / "l"),
        classifier_mode="crf",
        tag_mode="BIO",
        eval_mode="seqeval",
        end_epoch=1,
    )
    results = train(hyp, "sroie", spec=synthetic_spec(), max_steps=2)
    assert np.isfinite(results["primary_F1"])
    assert results["loss"] is None or np.isfinite(results["loss"])


def test_train_driver_uint8_eval_smoke(tmp_path):
    """``eval_uint8_upload: true`` routes the driver's validation through
    the serving uint8 wire (Collator(emit_uint8=True) +
    make_eval_step(image_stats=...)); metrics parity vs fp32 is pinned by
    test_data_eval.py::test_uint8_eval_wire_matches_fp32 — this smoke pins
    the driver wiring end-to-end."""
    root = str(tmp_path / "data")
    make_synthetic_root(root, n_train=4, n_test=2, seed=5)
    hyp = tiny_hyp(root)
    hyp.update(
        save_top=str(tmp_path / "w"),
        save_log=str(tmp_path / "l"),
        eval_uint8_upload=True,
        end_epoch=1,
    )
    results = train(hyp, "sroie", spec=synthetic_spec(), max_steps=2)
    assert np.isfinite(results["primary_F1"])
    assert results["loss"] is None or np.isfinite(results["loss"])


def test_train_driver_full_head_smoke(tmp_path):
    """The paper's two-stage 'full' classifier + full seg head end-to-end."""
    root = str(tmp_path / "data")
    make_synthetic_root(root, n_train=4, n_test=2, seed=4)
    hyp = tiny_hyp(root)
    hyp.update(
        save_top=str(tmp_path / "w"),
        save_log=str(tmp_path / "l"),
        classifier_mode="full",
        end_epoch=1,
    )
    results = train(hyp, "sroie", spec=synthetic_spec(), max_steps=2)
    assert np.isfinite(results["primary_F1"])


def test_train_driver_zero1_mesh_smoke(tmp_path):
    """Driver with yaml zero1 + an explicit 2-device data mesh: optimizer
    state shards and training/validation still run end-to-end."""
    root = str(tmp_path / "data")
    make_synthetic_root(root, n_train=4, n_test=2, seed=5)
    hyp = tiny_hyp(root)
    hyp.update(
        save_top=str(tmp_path / "w"),
        save_log=str(tmp_path / "l"),
        zero1=True,
        mesh_data=2,
        end_epoch=1,
    )
    results = train(hyp, "sroie", spec=synthetic_spec(), max_steps=2)
    assert np.isfinite(results["primary_F1"])
    opt_leaves = [
        l for l in __import__("jax").tree_util.tree_leaves(
            results["final_state"].opt_state
        )
        if hasattr(l, "sharding") and l.ndim > 0
    ]
    assert any("data" in str(l.sharding.spec) for l in opt_leaves)


def test_train_driver_roberta_crf_smoke(tmp_path):
    """RoBERTa end-to-end through the driver (BASELINE config #4: RoBERTa
    encoder + CRF head): the tokenizer's falsy ``<s>``=0 cls id must survive
    into the model config (the ``or 101`` bug class), windows must be framed
    with <s>/</s> = 0/2, and a few train steps must run."""
    import jax

    from vibertgrid_tpu.data.synthetic import write_roberta_tokenizer
    from vibertgrid_tpu.ops.windows import frame_windows
    from vibertgrid_tpu.train.driver import build_all, build_tokenizer

    root = str(tmp_path / "data")
    make_synthetic_root(root, n_train=4, n_test=2, seed=6)
    tok_dir = write_roberta_tokenizer(str(tmp_path))

    hyp = tiny_hyp(root)
    hyp.update(
        save_top=str(tmp_path / "w"),
        save_log=str(tmp_path / "l"),
        bert_version="tiny-roberta-test",
        tokenizer_path=tok_dir,
        classifier_mode="crf",
        tag_mode="BIO",
        eval_mode="seqeval",
        end_epoch=1,
    )

    tokenizer = build_tokenizer(hyp)
    assert tokenizer.cls_token_id == 0 and tokenizer.sep_token_id == 2
    _, cfg, _, _, _, _ = build_all(hyp, "sroie", tokenizer, synthetic_spec())
    assert cfg.cls_token_id == 0, "RoBERTa <s>=0 lost (falsy-id bug)"
    assert cfg.sep_token_id == 2
    assert cfg.resolved_text_config().flavor == "roberta"

    # window framing parity for RoBERTa ids (like TestWindows does for BERT)
    toks = np.arange(5, 5 + 510, dtype=np.int32)[None, :]
    ids, mask = frame_windows(
        jax.numpy.asarray(toks),
        jax.numpy.ones_like(jax.numpy.asarray(toks)),
        cls_id=cfg.cls_token_id,
        sep_id=cfg.sep_token_id,
    )
    assert int(ids[0, 0]) == 0 and int(ids[0, -1]) == 2

    results = train(hyp, "sroie", spec=synthetic_spec(), max_steps=2)
    assert np.isfinite(results["primary_F1"])
    assert results["loss"] is None or np.isfinite(results["loss"])


def test_build_all_threads_mesh_into_model_config():
    """A multi-device mesh reaches TextEncoderConfig.mesh (the sharded
    fused-attention wrapper's switch); 1-device meshes leave it None."""
    from vibertgrid_tpu.parallel import make_mesh
    from vibertgrid_tpu.train.driver import build_all

    hyp = {"num_classes": 5, "bert_version": "tiny-bert-test",
           "backbone": "resnet_18_fpn"}
    mesh = make_mesh(data=2, model=2)
    _, cfg, model, *_ = build_all(hyp, "sroie", spec=synthetic_spec(),
                                  mesh=mesh)
    assert cfg.mesh is mesh
    assert cfg.resolved_text_config().mesh is mesh

    _, cfg1, *_ = build_all(hyp, "sroie", spec=synthetic_spec(),
                            mesh=make_mesh(data=1, model=1))
    assert cfg1.mesh is None


def test_train_driver_long_corpus_multi_window(tmp_path):
    """Multi-thousand-token documents (≥4 510-token windows) through the
    complete driver: collation buckets the window axis, the encoder folds
    windows into batch, and train + validate run losslessly — the
    reference's unbounded sliding-window semantics
    (model/BERTgrid_generator.py:81-146) at full pipeline scope."""
    from vibertgrid_tpu.data.dataset import KIEDataset, WINDOW
    from vibertgrid_tpu.train.driver import build_tokenizer

    root = str(tmp_path / "data")
    make_synthetic_root(
        root, n_train=2, n_test=2, seed=1,
        words_range=(40, 60), segs_range=(8, 12),
    )
    hyp = tiny_hyp(root)
    hyp["batch_size"] = 2
    hyp["end_epoch"] = 1
    hyp["save_top"] = str(tmp_path / "weights")
    hyp["save_log"] = str(tmp_path / "log")

    # the generated corpora really do span >= 4 windows
    tok = build_tokenizer(hyp)
    ds = KIEDataset(f"{root}/train", synthetic_spec(), tok, train=True)
    n_tok = max(len(s.tokens) for s in (ds[i] for i in range(len(ds))))
    assert n_tok > 4 * WINDOW, n_tok

    results = train(hyp, "sroie", spec=synthetic_spec(), max_steps=2)
    assert np.isfinite(results["primary_F1"])
