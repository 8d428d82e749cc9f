"""Validation / evaluation harness.

Port of ``validate`` (``/root/reference/pipeline/train_val_utils.py:349-665``)
and the eval CLI bodies (``eval_SROIE.py:75-257``, ``eval_EPHOIE.py``,
``eval_FUNSD.py:24-67``), parameterized by :class:`DatasetSpec` instead of
copy-pasted per dataset.

Eval modes (example_config.yaml:55-58):
- ``seqeval``: token-level BIO F1 via :mod:`seqeval_lite`.
- ``strcmp``: join runs into entity strings, exact-compare vs key dicts (the
  official SROIE protocol).
- ``seq_and_str``: both.

Device outputs arrive padded ``[B, S, C]``; host code slices each sample's
valid segments. Cross-process metric reduction (the reference's all_reduce +
all_gather_object, train_val_utils.py:537-552): each process evaluates its
loader shard, then :func:`~vibertgrid_tpu.parallel.mesh.
process_allgather_objects` merges losses/counters/tag-seqs/per-sample dicts
so every process computes identical global metrics (no-op single-host).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import numpy as np

import jax

from vibertgrid_tpu.data.spec import DatasetSpec
from vibertgrid_tpu.eval.entities import (
    ephoie_result_filter,
    join_entities,
    sroie_result_filter,
)
from vibertgrid_tpu.eval.seqeval_lite import bio_f1, classification_report

RESULT_FILTERS: dict[str, Callable] = {
    "sroie": sroie_result_filter,
    "synthetic": None,
    "ephoie": ephoie_result_filter,
    "funsd": None,
}


def _tags_from_ids(ids, idx_to_tag):
    return [idx_to_tag[int(i)] for i in ids]


_LOG_FMT = "pred_key: [{pred_key}] gt_key: [{gt_key}] status: {status}"


def strcmp_compare(
    pred_keys: list[str], key_dict: dict, class_list, result_filter=None
):
    """Exact-string scoring of one document.

    Returns ``(recall_acc, precision_acc, n_gt, n_det, log, report_correct)``.
    The aggregate counters follow ``validate``'s protocol
    (train_val_utils.py:495-518: a class contributes only when its gt is
    non-empty), while ``report_correct`` and the ``log`` status follow the
    eval CLI's per-sample report (eval_SROIE.py:192-237: ``pred == gt``
    counts CORRECT even when both are empty) — the two diverge exactly on
    empty-gt classes, and the reference uses each in its own place.
    """
    recall_acc = precision_acc = 0.0
    n_det = n_gt = 0.0
    report_correct = 0.0
    log = {}
    for ci in range(1, len(class_list)):
        pred = pred_keys[ci]
        if result_filter is not None:
            pred = result_filter(pred, ci)
            if pred is None:
                pred = ""
        gt = key_dict.get(class_list[ci], "")
        if len(pred):
            n_det += 1
        correct = pred == gt  # report semantics (eval_SROIE.py:201)
        if correct:
            report_correct += 1
        if len(gt):
            n_gt += 1
            if correct:
                recall_acc += 1
                precision_acc += 1
        log[class_list[ci]] = _LOG_FMT.format(
            pred_key=pred, gt_key=gt, status="CORRECT" if correct else "ERROR"
        )
    return recall_acc, precision_acc, n_gt, n_det, log, report_correct


def validate(
    eval_step: Callable,
    state: Any,
    loader: Iterable,
    spec: DatasetSpec,
    *,
    eval_mode: str | None = None,
    tag_to_idx: dict | None = None,
    strcmp_thresh: float = 0.0,
    seqeval_average: str | None = None,
    result_filter: Callable | str | None = "default",
    verbose: bool = True,
) -> dict:
    """Run the model over a test loader and compute entity metrics.

    ``eval_step(state, batch) -> ModelOutput`` (jitted). Returns a dict with
    precision/recall/F1 (and token-level metrics for seq modes).
    """
    eval_mode = eval_mode or spec.default_eval_mode
    seqeval_average = seqeval_average or spec.seqeval_average
    if result_filter == "default":
        result_filter = RESULT_FILTERS.get(spec.name)
    class_list = list(spec.class_list)
    num_classes = len(class_list)

    recall_sum = precision_sum = num_gt = num_det = 0.0
    losses = []
    losses_c, losses_aux = [], []
    pred_tag_seqs, gt_tag_seqs = [], []
    pred_gt_pairs: list = []  # (pred [N,C] or ids [N], gt [N]) per document
    per_sample = {}

    for batch, aux in loader:
        images = getattr(batch, "images", None)  # tests stub the batch
        if images is not None and images.dtype == np.uint8:
            # uint8 wire format (4× fewer H2D bytes): the step normalizes
            # in-graph and needs the per-sample valid sizes to re-zero the
            # canvas padding (make_eval_step(..., image_stats=...)).
            out = eval_step(
                state, batch, np.asarray(aux.image_sizes, np.int32)
            )
        else:
            out = eval_step(state, batch)
        # ONE device→host fetch per batch (each fetch costs ~29 ms through
        # the tunnel): pull loss + predictions + labels together.
        loss_v, loss_c_v, loss_aux_v, pred, gt = jax.device_get(
            (out.total_loss, getattr(out, "loss_c", None),
             getattr(out, "loss_aux", None), out.pred_label, out.gt_label)
        )
        if loss_v is not None:
            losses.append(float(loss_v))
        if loss_c_v is not None:
            losses_c.append(float(loss_c_v))
        if loss_aux_v is not None:
            losses_aux.append(float(loss_aux_v))
        pred = np.asarray(pred, np.float32)
        gt = np.asarray(gt)
        for i, n_seg in enumerate(aux.n_segments):
            if n_seg == 0:
                continue
            probs_or_tags = pred[i, :n_seg]
            gt_ids = gt[i, :n_seg]
            pred_gt_pairs.append((probs_or_tags, gt_ids))

            if eval_mode in ("seqeval", "seq_and_str"):
                assert tag_to_idx is not None
                idx_to_tag = {v: k for k, v in tag_to_idx.items()}
                if probs_or_tags.ndim == 2:
                    pred_ids = probs_or_tags.argmax(-1)
                else:
                    pred_ids = probs_or_tags.astype(np.int64)
                pred_ids = np.clip(pred_ids, 0, len(idx_to_tag) - 1)
                pred_tag_seqs.append(_tags_from_ids(pred_ids, idx_to_tag))
                gt_tag_seqs.append(_tags_from_ids(gt_ids, idx_to_tag))

            if eval_mode in ("strcmp", "seq_and_str") and probs_or_tags.ndim == 2:
                # softmax over logits? heads already emit probabilities;
                # re-normalizing is a no-op for argmax/score ratios but the
                # reference re-softmaxes (train_val_utils.py:446), reproduced:
                z = probs_or_tags - probs_or_tags.max(-1, keepdims=True)
                probs = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
                pred_keys = join_entities(
                    probs,
                    aux.texts[i],
                    num_classes,
                    language=spec.language,
                    score_thresh=strcmp_thresh,
                )
                key_dict = aux.key_dicts[i] or {}
                r, p, g, d, log, rep = strcmp_compare(
                    pred_keys, key_dict, class_list, result_filter
                )
                recall_sum += r
                precision_sum += p
                num_gt += g
                num_det += d
                # per-sample metrics, reference report shape + semantics
                # (eval_SROIE.py:212-237): the report counts pred==gt even
                # for empty-gt classes, unlike the aggregate counters above.
                s_prec = 0.0 if d == 0 else rep / d
                s_rec = 1.0 if num_classes - 1 == 0 else rep / (num_classes - 1)
                s_hmean = (
                    0.0
                    if s_prec + s_rec == 0
                    else 2 * s_prec * s_rec / (s_prec + s_rec)
                )
                per_sample[key_dict.get("filename", len(per_sample))] = {
                    "precision": s_prec,
                    "recall": s_rec,
                    "hmean": s_hmean,
                    "correct": rep,
                    "log": log,
                    "pred": pred_keys,
                }

    # Cross-process metric gather (the reference's all_reduce of counters +
    # all_gather_object of pred/gt pairs, train_val_utils.py:537-552):
    # every process contributes its loader shard; all processes end up with
    # the same global lists and compute identical metrics. No-op single-host.
    if jax.process_count() > 1:
        from vibertgrid_tpu.parallel.mesh import process_allgather_objects

        shards = process_allgather_objects(
            dict(
                losses=losses,
                counters=(recall_sum, precision_sum, num_gt, num_det),
                pred_tag_seqs=pred_tag_seqs,
                gt_tag_seqs=gt_tag_seqs,
                pred_gt_pairs=pred_gt_pairs,
                per_sample=per_sample,
            )
        )
        losses = [l for s in shards for l in s["losses"]]
        recall_sum = sum(s["counters"][0] for s in shards)
        precision_sum = sum(s["counters"][1] for s in shards)
        num_gt = sum(s["counters"][2] for s in shards)
        num_det = sum(s["counters"][3] for s in shards)
        pred_tag_seqs = [x for s in shards for x in s["pred_tag_seqs"]]
        gt_tag_seqs = [x for s in shards for x in s["gt_tag_seqs"]]
        pred_gt_pairs = [x for s in shards for x in s["pred_gt_pairs"]]
        merged: dict = {}
        for s in shards:
            merged.update(s["per_sample"])
        per_sample = merged

    results: dict = {"loss": float(np.mean(losses)) if losses else None}
    # Loss decomposition (total = loss_c + λ·loss_aux) — diagnostic only,
    # local-process means; absent when the model skipped loss computation.
    if losses_c:
        results["loss_c"] = float(np.mean(losses_c))
    if losses_aux:
        results["loss_aux"] = float(np.mean(losses_aux))
    if pred_gt_pairs:
        # Token-level accuracy (pipeline/criteria.py:12-21) and the per-class
        # TP/TN/FP/FN dict (criteria.py:55-95) the reference's token eval
        # branch reports (train_val_utils.py:628-645).
        from vibertgrid_tpu.eval.criteria import (
            token_classification_criteria,
            token_F1_criteria,
        )

        n_correct = n_total = 0.0
        for p_, g_ in pred_gt_pairs:
            c, n = token_classification_criteria(g_, p_)
            n_correct += c
            n_total += n
        results["token_accuracy"] = 0.0 if n_total == 0 else n_correct / n_total
        if pred_gt_pairs[0][0].ndim == 2:
            results["token_F1_dict"] = token_F1_criteria(pred_gt_pairs)
    if eval_mode in ("seqeval", "seq_and_str") and pred_tag_seqs:
        p, r, f = bio_f1(gt_tag_seqs, pred_tag_seqs, seqeval_average)
        results.update(token_precision=p, token_recall=r, token_F1=f)
        from vibertgrid_tpu.eval.seqeval_lite import per_type_f1

        # Per-type F1: the learnability gate's collapse signature (a
        # majority-class model scores on ≤1 type); also the reference's
        # per-type report content (seqeval classification_report printed
        # at train_val_utils.py:640).
        results["per_type_F1"] = per_type_f1(gt_tag_seqs, pred_tag_seqs)
        if verbose:
            print(classification_report(gt_tag_seqs, pred_tag_seqs))
    if eval_mode in ("strcmp", "seq_and_str"):
        recall = 0.0 if num_gt == 0 else recall_sum / num_gt
        precision = 0.0 if num_det == 0 else precision_sum / num_det
        f1 = (
            0.0
            if recall + precision == 0
            else 2 * recall * precision / (recall + precision)
        )
        results.update(precision=precision, recall=recall, F1=f1)
        results["per_sample"] = per_sample
    # The scalar used for checkpoint ranking (train_SROIE.py:374-377).
    results["primary_F1"] = results.get("F1", results.get("token_F1", 0.0))
    if verbose:
        shown = {
            k: round(v, 4)
            for k, v in results.items()
            if isinstance(v, float)
        }
        print(f"validate[{spec.name}] {shown}")
    return results


def evaluate_dataset(
    eval_step, state, loader, spec, tag_mode: str = "B", **kw
) -> dict:
    """eval_*.py equivalent: batch-size-1 loop + per-dataset filters."""
    return validate(
        eval_step,
        state,
        loader,
        spec,
        tag_to_idx=spec.tag_to_idx(tag_mode),
        **kw,
    )


def inference_once(
    eval_step,
    state,
    batch,
    aux,
    spec: DatasetSpec,
    draw: bool = False,
    save_path: str = "./inference_result.jpg",
) -> list[dict]:
    """Single-batch inference demo (train_val_utils.py:668-733): prints
    timing, collects per-class {text: box} dicts, optionally draws boxes."""
    import time

    assert len(aux.n_segments) == 1, "inference_once expects batch size 1"
    t0 = time.time()
    out = eval_step(state, batch)
    pred = np.asarray(out.pred_label, np.float32)
    print(f"inference speed: {(time.time() - t0) * 1000:.1f}ms")

    n = aux.n_segments[0]
    probs = pred[0, :n]
    pred_cls = probs.argmax(-1) if probs.ndim == 2 else probs.astype(int)
    boxes = np.asarray(batch.boxes)[0, :n]
    class_result = [dict() for _ in range(spec.num_classes - 1)]
    for text, box, cls in zip(aux.texts[0], boxes, pred_cls):
        if int(cls) == 0:
            continue
        class_result[int(cls) - 1][text] = box.tolist()
    for item in class_result:
        print(item)
    if draw:
        from vibertgrid_tpu.utils.visualize import draw_box

        img = np.asarray(batch.images)[0]
        draw_box(img, class_result, list(spec.class_list), save_path=save_path)
    return class_result
