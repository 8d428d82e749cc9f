"""TPU-native compute primitives (XLA + Pallas) for ViBERTgrid.

These replace the reference implementation's Python hot loops and native
library ops:

- :mod:`rasterize` — later-box-wins winner maps powering both the BERTgrid
  scatter (reference ``model/BERTgrid_generator.py:220-245``) and the
  on-the-fly segmentation label rasterization
  (``model/semantic_segmentation_head.py:199-214``).
- :mod:`segments` — token→segment embedding aggregation, replacing the
  sequential Python token loop (``model/BERTgrid_generator.py:148-191``).
- :mod:`roi_align` — torchvision-semantics RoIAlign
  (``model/grid_roi_align.py:37-41``) as masked static-shape XLA and a Pallas
  TPU kernel.
- :mod:`windows` — sliding 510-token window framing for BERT
  (``model/BERTgrid_generator.py:81-146``) as one batched reshape.
"""

from vibertgrid_tpu.ops.rasterize import (  # noqa: F401
    box_winner_map,
    bertgrid_scatter,
    rasterize_label_maps,
)
from vibertgrid_tpu.ops.segments import aggregate_token_embeddings  # noqa: F401
from vibertgrid_tpu.ops.windows import frame_windows, unframe_windows  # noqa: F401
from vibertgrid_tpu.ops.roi_align import roi_align  # noqa: F401
