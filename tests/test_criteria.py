"""Oracle tests for the token/pixel metric kernels (eval/criteria.py) vs
direct torch transcriptions of ``/root/reference/pipeline/criteria.py``."""

import numpy as np
import pytest
import torch

from vibertgrid_tpu.eval.criteria import (
    semantic_segmentation_classification_criteria,
    token_classification_criteria,
    token_F1_criteria,
)


def torch_token_classification(gt_label, pred_label):
    """pipeline/criteria.py:12-21 semantics."""
    pred = pred_label.argmax(dim=1).int()
    num_correct = 0.0
    for i in range(gt_label.shape[0]):
        if gt_label[i] == pred[i]:
            num_correct += 1
    return num_correct, gt_label.shape[0]


def torch_token_f1(pred_gt_list):
    """pipeline/criteria.py:55-95 semantics (incl. the .int() truncation)."""
    pred = torch.cat([p for p, _ in pred_gt_list], dim=0)
    gt = torch.cat([g for _, g in pred_gt_list], dim=0)
    num_classes = pred.shape[1]
    pred = pred.int()
    out = {}
    for c in range(num_classes):
        idx = gt == c
        TP = (pred[idx, c] == 1).int().sum().item()
        TN = (pred[~idx, c] == 0).int().sum().item()
        FP = (pred[~idx, c] == 1).int().sum().item()
        FN = (pred[idx, c] == 0).int().sum().item()
        p_ = TP / (TP + FP + 1e-8)
        r_ = TP / (TP + FN + 1e-8)
        f_ = 2 * p_ * r_ / (p_ + r_ + 1e-8)
        out[c] = {
            "TP": TP, "TN": TN, "FP": FP, "FN": FN,
            "precision": p_, "recall": r_, "F1": f_,
        }
    out["num_classes"] = num_classes
    return out


class TestTokenAccuracy:
    def test_matches_torch_oracle(self):
        rng = np.random.default_rng(0)
        gt = rng.integers(0, 5, 64)
        pred = rng.random((64, 5)).astype(np.float32)
        ours = token_classification_criteria(gt, pred)
        ref = torch_token_classification(
            torch.from_numpy(gt), torch.from_numpy(pred)
        )
        assert ours[0] == ref[0] and ours[1] == ref[1]

    def test_decoded_ids(self):
        gt = np.array([0, 1, 2, 2])
        pred_ids = np.array([0, 1, 1, 2])
        assert token_classification_criteria(gt, pred_ids) == (3.0, 4)


class TestTokenF1Dict:
    def test_matches_torch_oracle(self):
        rng = np.random.default_rng(1)
        pairs_np, pairs_t = [], []
        for n in (7, 13, 5):
            # mix of truncating probs and exact 0/1 one-hots — both regimes
            # of the reference's .int() quirk
            probs = rng.random((n, 4)).astype(np.float32)
            onehot = np.eye(4, dtype=np.float32)[rng.integers(0, 4, n)]
            pred = np.where(rng.random((n, 1)) < 0.5, probs, onehot)
            gt = rng.integers(0, 4, n)
            pairs_np.append((pred, gt))
            pairs_t.append((torch.from_numpy(pred), torch.from_numpy(gt)))
        ours = token_F1_criteria(pairs_np)
        ref = torch_token_f1(pairs_t)
        assert ours["num_classes"] == ref["num_classes"] == 4
        for c in range(4):
            for k in ("TP", "TN", "FP", "FN"):
                assert ours[c][k] == ref[c][k], (c, k)
            for k in ("precision", "recall", "F1"):
                assert ours[c][k] == pytest.approx(ref[c][k])

    def test_perfect_onehot(self):
        gt = np.array([0, 1, 2])
        pred = np.eye(3, dtype=np.float32)
        d = token_F1_criteria([(pred, gt)])
        for c in range(3):
            assert d[c]["F1"] == pytest.approx(1.0, abs=1e-6)


class TestSegClassification:
    def test_single_pixel_matches_reference_case(self):
        # 1-pixel crops: the only case the reference's `if tensor == tensor`
        # doesn't crash on — exact parity required there.
        pred = np.zeros((1, 3, 8, 8), np.float32)
        gt = np.zeros((1, 3, 8, 8), np.float32)
        pred[0, 1, 2, 2] = 1.0
        gt[0, 1, 2, 2] = 1.0  # match
        pred[0, 2, 5, 5] = 1.0
        gt[0, 1, 5, 5] = 1.0  # mismatch
        coor = np.array([[[2, 2, 3, 3], [5, 5, 6, 6]]])
        correct, total = semantic_segmentation_classification_criteria(
            pred, gt, coor
        )
        assert (correct, total) == (1.0, 2)

    def test_multi_pixel_all_must_agree(self):
        pred = np.zeros((1, 2, 4, 4), np.float32)
        gt = np.zeros((1, 2, 4, 4), np.float32)
        gt[0, 1, :2, :2] = 1.0
        pred[0, 1, :2, :2] = 1.0
        pred[0, 1, 1, 1] = 0.0
        pred[0, 0, 1, 1] = 1.0  # one disagreeing pixel
        coor = np.array([[[0, 0, 2, 2]]])
        correct, total = semantic_segmentation_classification_criteria(
            pred, gt, coor
        )
        assert (correct, total) == (0.0, 1)
        # fix the pixel → correct
        pred[0, 0, 1, 1] = 0.0
        pred[0, 1, 1, 1] = 1.0
        correct, _ = semantic_segmentation_classification_criteria(
            pred, gt, coor
        )
        assert correct == 1.0


def test_validate_surfaces_token_metrics():
    """validate() now reports token_accuracy and the per-class F1 dict, and
    per-sample entries carry the reference report shape
    (eval_SROIE.py:231-237)."""
    from types import SimpleNamespace

    from vibertgrid_tpu.data.dataset import EvalAux
    from vibertgrid_tpu.data.spec import SROIE_SPEC
    from vibertgrid_tpu.eval.harness import validate

    n_seg, n_cls = 6, 5
    probs = np.eye(n_cls, dtype=np.float32)[np.array([0, 1, 1, 0, 4, 2])]
    gt = np.array([0, 1, 1, 0, 4, 3])

    out = SimpleNamespace(
        total_loss=None,
        pred_label=probs[None],
        gt_label=gt[None],
    )
    aux = EvalAux(
        texts=[["a", "b", "c", "d", "e", "f"]],
        key_dicts=[{"filename": "doc0", "company": "b c", "total": "e"}],
        n_segments=[n_seg],
    )
    results = validate(
        lambda state, batch: out,
        None,
        [(None, aux)],
        SROIE_SPEC,
        eval_mode="strcmp",
        result_filter=None,
        verbose=False,
    )
    assert results["token_accuracy"] == pytest.approx(5 / 6)
    d = results["token_F1_dict"]
    assert d["num_classes"] == n_cls
    assert d[1]["TP"] == 2 and d[3]["FN"] == 1
    samp = results["per_sample"]["doc0"]
    for k in ("precision", "recall", "hmean", "correct", "log", "pred"):
        assert k in samp
    assert "company" in samp["log"] and "status:" in samp["log"]["company"]
