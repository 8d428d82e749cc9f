"""Evaluation: BIO entity F1 (seqeval-compatible), entity joining ("strcmp"
official SROIE protocol), per-dataset post filters, and the validate harness."""

from vibertgrid_tpu.eval.seqeval_lite import (  # noqa: F401
    bio_f1,
    classification_report,
    get_entities,
)
from vibertgrid_tpu.eval.entities import (  # noqa: F401
    join_entities,
    sroie_result_filter,
    ephoie_result_filter,
)
from vibertgrid_tpu.eval.harness import validate, evaluate_dataset  # noqa: F401
