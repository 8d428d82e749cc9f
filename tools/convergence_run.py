"""Full-scale end-to-end convergence on the synthetic KIE task (real chip).

Drives the COMPLETE training driver (bucketed loading, device prefetch,
bf16 train step, entity-level validation, top-F1 checkpointing) at
full model scale from scratch and reports the best F1 — the strongest
end-to-end learnability evidence obtainable without real datasets
(no network egress; see docs/PARITY.md for the per-op oracle tests).

Configs mirror the reference's published rows (BASELINE.md):
  --config bert      BERT-base-uncased + ResNet-18-FPN, simp head
  --config roberta   RoBERTa-base + ResNet-18-FPN, CRF head (BIO tags)
                     — BASELINE row #2 / VERDICT r1 "config #4", exercising
                     the <s>=0 cls id, BPE tokenizer files, BIO transitions
                     and Viterbi decode end-to-end through the driver.
  --config full      BERT-base-uncased + ResNet-18-FPN, the paper's
                     two-stage head (binary pos/neg gate + per-class BCE-OHEM
                     classifiers, ref field_type_classification_head.py:193-407)
                     with the full (non-simplified) aux seg head.

Measured (v5e, 32 synthetic train docs): see README "Convergence".
Recipe (recalibrated 2026-08-19 after the tunnel re-established to a new
chip environment): cnn SGD lr 1e-3 + 3-epoch warmup, bert AdamW 2e-4.
The earlier lr 5e-3 / no-warmup recipe was knife-edge — it converged in
the pre-outage environment but collapses in the current one (val loss
explodes to ~400, majority-class plateau), REGARDLESS of code version:
the exact known-good commit cc9c548 reproduces the collapse on identical
data and seed (logs/requalify/r3_control_cc9c548.log), while lr 1e-3 +
warmup trains to F1 0.99+ (r3_probe_lowlr.log). See convergence_bisect.py
for the attribution matrix ([SEP] placement, always-MLP head, host
pipeline, optimizer-state dtype: all ruled out).

Usage: python tools/convergence_run.py --config roberta [--epochs 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config", choices=["bert", "roberta", "full"], default="roberta"
    )
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n-train", type=int, default=32)
    ap.add_argument("--n-test", type=int, default=8)
    ap.add_argument(
        "--optimizer-state-dtype", default=None,
        choices=["bfloat16", "float32"],
        help="override optimizer-state storage (the fp32-vs-bf16 "
             "convergence A/B, ADVICE r2 #4)",
    )
    ap.add_argument("--cnn-lr", type=float, default=1e-3)
    ap.add_argument("--bert-lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument(
        "--val-every", type=int, default=1,
        help="validate every N epochs (long runs; final epoch always)",
    )
    args = ap.parse_args()

    import jax

    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    from vibertgrid_tpu.data.synthetic import (
        make_synthetic_root,
        synthetic_spec,
        write_roberta_tokenizer,
    )
    from vibertgrid_tpu.train.driver import train

    tmp = tempfile.mkdtemp(prefix="converge_")
    root = os.path.join(tmp, "data")
    # BIO roots carry BIO *tag ids* in data_class (the reference's
    # preprocessing contract — see make_synthetic_root's docstring). The
    # roberta/CRF config evaluates under tag_mode="BIO"; feeding it the
    # plain-class-id "B" root is the label-space bug behind the r4 CRF
    # report only ever showing 2 entity types (r4_conv_roberta.log).
    make_synthetic_root(
        root, n_train=args.n_train, n_test=args.n_test, seed=0,
        tag_scheme="BIO" if args.config == "roberta" else "B",
    )

    hyp = {
        "comment": f"convergence-{args.config}",
        "tee_logs": False,
        "data_root": root,
        "batch_size": 8,
        "start_epoch": 0,
        "end_epoch": args.epochs,
        "num_classes": 5,
        "val_epoch_interval": args.val_every,
        "backbone": "resnet_18_fpn",
        "eval_mode": "seq_and_str",
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
        "weights": "",
        "save_top": os.path.join(tmp, "weights"),
        "save_log": os.path.join(tmp, "log"),
        # Qualification runs measure LEARNABILITY, so hold the lr instead
        # of the reference-default recurring StepLR(15, 0.1) (which would
        # starve any run past ~30 epochs to lr*1e-2 and below): one x0.1
        # decay at 75% of the run.
        "lr_steps": [max(1, int(args.epochs * 0.75))],
        # Stable recipe (2026-08-19 recalibration — see module docstring):
        # cnn lr 1e-3 + 3-epoch warmup. lr 5e-3 w/o warmup is knife-edge
        # (collapses in the current chip environment at ANY code version).
        "optimizer_cnn_hyp": dict(
            learning_rate=args.cnn_lr, min_learning_rate=1e-5,
            warm_up_epoches=args.warmup,
            warm_up_init_lr=1e-5, momentum=0.9, weight_decay=5e-4,
            min_weight_decay=5e-4,
        ),
        "optimizer_bert_hyp": dict(
            learning_rate=args.bert_lr, min_learning_rate=1e-7,
            warm_up_epoches=args.warmup,
            warm_up_init_lr=1e-7, beta1=0.9, beta2=0.999, epsilon=1e-8,
            weight_decay=0.01, min_weight_decay=0.01,
        ),
    }
    if args.config == "roberta":
        hyp.update(
            bert_version="roberta-base",
            tokenizer_path=write_roberta_tokenizer(tmp),
            classifier_mode="crf",
            tag_mode="BIO",
            eval_mode="seqeval",
        )
    elif args.config == "full":
        hyp.update(
            bert_version="bert-base-uncased",
            tokenizer_path=f"{root}/vocab.txt",
            classifier_mode="full",
            tag_mode="B",
            # The reference decision rule returns background whenever the
            # gate's sigmoid ≥ the true class's — on this saturating
            # synthetic task that pins F1 to 0 no matter how well the head
            # trains (tests/test_model.py::test_full_head_standalone_
            # learnability). Qualify learnability with the paper-intent
            # gated rule; reference parity is covered by the forward-parity
            # tests (default full_head_decision stays "reference").
            full_head_decision="gated",
        )
    else:
        hyp.update(
            bert_version="bert-base-uncased",
            tokenizer_path=f"{root}/vocab.txt",
            classifier_mode="simp",
            tag_mode="B",
        )

    if args.optimizer_state_dtype:
        hyp["optimizer_state_dtype"] = args.optimizer_state_dtype

    results = train(hyp, "sroie", spec=synthetic_spec())
    scalars = {
        k: round(float(v), 4)
        for k, v in results.items()
        if isinstance(v, (int, float)) or getattr(v, "ndim", None) == 0
    }
    print(f"\nconfig={args.config} epochs={args.epochs} final={scalars}")


if __name__ == "__main__":
    main()
