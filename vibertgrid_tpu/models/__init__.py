"""Flax model components of the ViBERTgrid-TPU framework."""

from vibertgrid_tpu.models.bert import (  # noqa: F401
    TextEncoder,
    TextEncoderConfig,
    BERT_MODEL_REGISTRY,
)
from vibertgrid_tpu.models.resnet_fpn import (  # noqa: F401
    ResNetFPN,
    BACKBONE_REGISTRY,
    make_backbone,
)
from vibertgrid_tpu.models.heads import (  # noqa: F401
    LateFusion,
    FieldTypeClassification,
    SimplifiedFieldTypeClassification,
    CRFFieldTypeClassification,
)
from vibertgrid_tpu.models.seg_head import (  # noqa: F401
    SemanticSegmentationHead,
    SimplifiedSemanticSegmentationHead,
)
from vibertgrid_tpu.models.vibertgrid import ViBERTgridNet, ModelConfig  # noqa: F401
from vibertgrid_tpu.models.convert_reference import (  # noqa: F401
    load_reference_checkpoint,
)
