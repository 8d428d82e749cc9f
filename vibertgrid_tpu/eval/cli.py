"""Evaluation CLI: one parameterized entry for all datasets.

Replaces the three copy-paste eval scripts (``/root/reference/eval_SROIE.py``,
``eval_EPHOIE.py``, ``eval_FUNSD.py``):

    python -m vibertgrid_tpu.eval.cli --config cfg.yaml --dataset sroie

Loads the YAML config and checkpoint (``weights:`` key), runs the
batch-size-1 test loop with the dataset's entity join + post filters, prints
method P/R/F1 and writes the per-sample JSON report to
``result/<ckpt>.json`` (mirroring ``eval_SROIE.py:364-369``).
"""

from __future__ import annotations

import argparse
import json
import os

import yaml

from vibertgrid_tpu.data import KIEDataset, data_loader
from vibertgrid_tpu.eval.harness import validate
from vibertgrid_tpu.train.checkpoint import CheckpointManager
from vibertgrid_tpu.train.driver import build_all, build_tokenizer
from vibertgrid_tpu.train.optim import make_optimizer
from vibertgrid_tpu.train.state import create_train_state, make_eval_step


def evaluate(hyp: dict, dataset: str, spec=None, state=None) -> dict:
    tokenizer = build_tokenizer(hyp)
    spec, cfg, model, transform, collator, tag_to_idx = build_all(
        hyp, dataset, tokenizer, spec
    )
    test_ds = KIEDataset(
        os.path.join(hyp["data_root"], "test"), spec, tokenizer, train=False
    )

    if state is None:
        weights = hyp.get("weights", "")
        ref_weights = hyp.get("reference_weights", "")
        assert weights or ref_weights, (
            "weights (or reference_weights for a ViBERTgrid-PyTorch "
            "checkpoint) must be provided (eval_SROIE.py:333-340)"
        )
        optimizer = (
            make_optimizer(hyp, 1, 1)
            if "optimizer_cnn_hyp" in hyp
            else __import__("optax").sgd(1e-3)
        )
        sample_batch, _ = next(
            iter(data_loader(test_ds, collator, batch_size=1, train=False))
        )
        state = create_train_state(model, optimizer, sample_batch, seed=0)
        if ref_weights:
            # migration path: evaluate a reference-trained torch checkpoint
            from vibertgrid_tpu.models import load_reference_checkpoint
            from vibertgrid_tpu.train.driver import _load_torch_state_dict

            variables = load_reference_checkpoint(
                {"params": state.params, "batch_stats": state.batch_stats},
                _load_torch_state_dict(ref_weights),
            )
            state = state.replace(
                params=variables["params"],
                batch_stats=variables["batch_stats"],
            )
        else:
            ckpt = CheckpointManager(os.path.dirname(weights) or ".")
            state, _ = ckpt.restore(weights, state)

    # eval_uint8_upload: the serving engine's uint8 wire for evaluation —
    # 4× fewer H2D bytes, ≤0.5/255 in-graph quantization (measured 5.71×
    # end-to-end on a bandwidth-bound link, tools/eval_bench.py). Off by
    # default: exact fp32 numerics for published metrics.
    if hyp.get("eval_uint8_upload", False):
        from vibertgrid_tpu.data.dataset import Collator

        collator = Collator(transform, emit_uint8=True)
        eval_step = make_eval_step(
            model, image_stats=(transform.image_mean, transform.image_std)
        )
    else:
        eval_step = make_eval_step(model)
    # Default bs-1 mirrors the reference eval scripts exactly; any larger
    # eval_batch_size switches to the bucketed batched loader.
    ebs = hyp.get("eval_batch_size", 1)
    if ebs > 1:
        from vibertgrid_tpu.data import bucketed_eval_loader

        loader = bucketed_eval_loader(test_ds, collator, batch_size=ebs)
    else:
        loader = data_loader(test_ds, collator, batch_size=1, train=False)
    results = validate(
        eval_step,
        state,
        loader,
        spec,
        eval_mode=hyp.get("eval_mode", spec.default_eval_mode),
        tag_to_idx=tag_to_idx,
        seqeval_average=hyp.get("seqeval_average", spec.seqeval_average),
    )

    print(
        f"precision[{results.get('precision', 0):.4f}] "
        f"recall[{results.get('recall', 0):.4f}] "
        f"F1[{results.get('primary_F1', 0):.4f}]"
    )
    result_dir = hyp.get("result_dir", "result")
    os.makedirs(result_dir, exist_ok=True)
    tag = os.path.basename(hyp.get("weights", "eval")).replace("/", "_") or "eval"
    out_path = os.path.join(result_dir, tag + ".json")
    serializable = {
        k: v for k, v in results.items() if k not in ("final_state",)
    }
    with open(out_path, "w") as f:
        json.dump(serializable, f, ensure_ascii=False, default=str)
    print(f"report written to {out_path}")
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(description="ViBERTgrid-TPU evaluation")
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument(
        "-d", "--dataset", default="sroie", choices=["sroie", "ephoie", "funsd"]
    )
    args = parser.parse_args(argv)
    with open(args.config) as f:
        hyp = yaml.safe_load(f)
    evaluate(hyp, args.dataset)


if __name__ == "__main__":
    main()
