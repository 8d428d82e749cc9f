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
    training-signal regressions that shape-level smokes cannot."""
    root = str(tmp_path / "data")
    make_synthetic_root(root, n_train=12, n_test=4, n_classes=3, seed=2)
    hyp = tiny_hyp(root)
    hyp.update(
        save_top=str(tmp_path / "w"),
        save_log=str(tmp_path / "l"),
        end_epoch=3,
        batch_size=4,
        eval_mode="seqeval",
    )
    hyp["optimizer_cnn_hyp"]["learning_rate"] = 3e-3
    hyp["optimizer_bert_hyp"]["learning_rate"] = 5e-4
    results = train(hyp, "sroie", spec=synthetic_spec())
    assert results["best_F1"] > 0.5, results["best_F1"]


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
