"""Learnability: the full stack trains to meaningful F1 on synthetic data.

Slow (minutes); gated behind VIBERTGRID_RUN_SLOW=1 so the default suite stays
fast. Run explicitly:

    VIBERTGRID_RUN_SLOW=1 python -m pytest tests/test_learnability.py -q
"""

import os

import numpy as np
import pytest

from vibertgrid_tpu.data.synthetic import make_synthetic_root, synthetic_spec
from vibertgrid_tpu.train.driver import train
from tests.test_train_driver import tiny_hyp

_slow = pytest.mark.skipif(
    not os.environ.get("VIBERTGRID_RUN_SLOW"),
    reason="slow learnability test; set VIBERTGRID_RUN_SLOW=1",
)


def test_fast_learnability_always_on(tmp_path):
    """Non-gated learnability check (VERDICT r1 #8): a few epochs on a tiny
    synthetic set must push F1 well above chance — catches silent
    training-signal regressions that shape-level smokes cannot.

    Calibration (deterministic on the CPU test platform — the virtual
    8-device flag itself changes reduction order, so calibrate under
    pytest's env; .scratch-style recipe in git history): since the simp
    head reproduces the reference's always-MLP quirk
    (field_type_classification_head.py:474 "sigle" typo), the tiny-scale
    task needs lr warmup and more steps. At 24 epochs this config
    measures best_F1 = 0.667 with TWO entity types learned; a collapsed
    (majority-class) run plateaus at 0.333-0.348 with at most ONE type
    scoring — the 0.5 threshold separates them by ≥0.15 on the F1 axis
    (VERDICT r3 weak #7; the earlier 12-epoch calibration measured 0.467,
    which per-type F1 exposed as single-type learning).

    The gate also asserts the collapse signature directly: a
    majority-class model scores nonzero entity F1 on at most ONE type
    (everything is predicted as one class); a seed wobble on the F1
    scalar cannot fake type diversity."""
    root = str(tmp_path / "data")
    make_synthetic_root(root, n_train=16, n_test=4, n_classes=3, seed=0)
    hyp = tiny_hyp(root)
    hyp.update(
        save_top=str(tmp_path / "w"),
        save_log=str(tmp_path / "l"),
        end_epoch=24,
        batch_size=4,
        eval_mode="seqeval",
        # single device: the 8-device virtual mesh reassociates reductions,
        # and 96 tiny-scale SGD steps amplify the float drift into a
        # different local optimum — DP equivalence is pinned elsewhere
        # (test_parallel_train), learnability is calibrated single-device
        mesh_data=1,
        mesh_model=1,
    )
    hyp["optimizer_cnn_hyp"].update(learning_rate=5e-3, warm_up_epoches=3)
    hyp["optimizer_bert_hyp"].update(learning_rate=5e-4, warm_up_epoches=3)
    results = train(hyp, "sroie", spec=synthetic_spec())
    assert results["best_F1"] > 0.5, results["best_F1"]
    assert results["best_learned_types"] >= 2, (
        results["best_learned_types"],
        results.get("per_type_F1"),
    )


@_slow
def test_f1_improves_on_synthetic(tmp_path):
    root = str(tmp_path / "data")
    make_synthetic_root(root, n_train=16, n_test=6, seed=1)
    hyp = tiny_hyp(root)
    hyp.update(
        save_top=str(tmp_path / "w"),
        save_log=str(tmp_path / "l"),
        end_epoch=12,
        batch_size=4,
        eval_mode="seqeval",
    )
    hyp["optimizer_cnn_hyp"]["learning_rate"] = 3e-3
    hyp["optimizer_bert_hyp"]["learning_rate"] = 5e-4
    results = train(hyp, "sroie", spec=synthetic_spec())
    assert results["best_F1"] > 0.3, results["best_F1"]
