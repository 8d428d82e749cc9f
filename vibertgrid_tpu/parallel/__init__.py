"""Device-mesh parallelism: the TPU-native replacement for the reference's
NCCL/DDP stack (``/root/reference/pipeline/distributed_utils.py``).

Instead of process groups, DistributedSampler, SyncBatchNorm conversion and
explicit all_reduce calls, training shards the batch over a ``data`` mesh
axis (and optionally weights over a ``model`` axis) and lets GSPMD insert the
collectives over ICI/DCN — see SURVEY.md §2.2.
"""

from vibertgrid_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
)
from vibertgrid_tpu.parallel.sharding import (  # noqa: F401
    optimizer_state_shardings,
    param_shardings,
    shard_optimizer_state,
)
