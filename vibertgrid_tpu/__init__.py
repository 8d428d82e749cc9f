"""ViBERTgrid-TPU: a TPU-native (JAX / XLA / Pallas / pjit) framework for joint
CNN+BERT key-information extraction from document images.

A ground-up rebuild of the capabilities of ZeningLin/ViBERTgrid-PyTorch
(reference layout documented in SURVEY.md): BERTgrid generation, early-fused
ResNet-FPN backbones, RoI-aligned late fusion, field-type classification heads
(full / simplified / CRF), auxiliary semantic segmentation, OHEM losses,
data-parallel training over a device mesh, entity-level evaluation for
SROIE / EPHOIE / FUNSD, and an HTTP inference service.

Everything under :mod:`vibertgrid_tpu` is designed TPU-first: static bucketed
shapes, one jit-compiled train step, Pallas kernels for the grid scatter and
RoIAlign hot ops, and GSPMD sharding instead of NCCL DDP.
"""

__version__ = "0.1.0"
