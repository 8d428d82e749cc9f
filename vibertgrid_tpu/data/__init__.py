"""Host-side data pipeline: transforms, datasets, bucketed collation.

The reference ships three near-identical dataset classes and three
copy-paste train/eval scripts (SURVEY.md §1 "key structural fact"); here one
parameterized :class:`KIEDataset` + declarative :class:`DatasetSpec` objects
cover SROIE / EPHOIE / FUNSD.
"""

from vibertgrid_tpu.data.transform import ImageTransform, bilinear_resize  # noqa: F401
from vibertgrid_tpu.data.spec import (  # noqa: F401
    DatasetSpec,
    SROIE_SPEC,
    EPHOIE_SPEC,
    FUNSD_SPEC,
    get_spec,
)
from vibertgrid_tpu.data.dataset import (  # noqa: F401
    KIEDataset,
    Collator,
    EvalAux,
    bucketed_eval_loader,
    compute_mean_std,
    data_loader,
    prefetch_to_device,
)
from vibertgrid_tpu.data.synthetic import make_synthetic_root  # noqa: F401
