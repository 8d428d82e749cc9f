"""The ViBERTgrid network: joint CNN+BERT document KIE model.

Rebuild of ``/root/reference/model/ViBERTgrid_net.py`` as one jit-compiled
Flax module over a static-shape :class:`Batch`:

tokens ─ windowed BERT ─ segment aggregation ─┐
                                              ├─ BERTgrid scatter ─ early-fused
images ───────────────────────────────────────┘   ResNet-FPN ─ P_fuse
P_fuse ─ aux segmentation head (train/eval only)
P_fuse ─ RoIAlign ─ late fusion with segment BERT embeddings ─ field-type head
total_loss = loss_c + λ · loss_aux                (ref :539)

Differences from the reference, by design (SURVEY.md §7):

- The normalize/resize/pad transform (ref ``pipeline/transform.py``) is
  host-side (:mod:`vibertgrid_tpu.data.transform`); the model consumes
  bucketed fixed shapes, so every bucket signature compiles once.
- Work modes: the reference mutates module structure per mode
  (:334-335, :376-383). Here one module covers all modes; ``train``/
  ``compute_loss`` flags select the path (inference skips the aux head and
  all loss computation, matching ``work_mode='inference'``).
- Variable-length everything is masked, not filtered.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct

from vibertgrid_tpu.models.bert import (
    BERT_MODEL_REGISTRY,
    TextEncoder,
    TextEncoderConfig,
)
from vibertgrid_tpu.models.resnet_fpn import BACKBONE_REGISTRY, ResNetFPN
from vibertgrid_tpu.models.heads import (
    CRFFieldTypeClassification,
    FieldTypeClassification,
    LateFusion,
    SimplifiedFieldTypeClassification,
)
from vibertgrid_tpu.models.seg_head import (
    SemanticSegmentationHead,
    SimplifiedSemanticSegmentationHead,
)
from vibertgrid_tpu.ops import (
    aggregate_token_embeddings,
    bertgrid_scatter,
    frame_windows,
    roi_align,
    unframe_windows,
)


@flax.struct.dataclass
class Batch:
    """Static-shape device batch (host collation pads into buckets)."""

    images: jax.Array      # [B, H, W, 3] float32, normalized + resized + padded
    tokens: jax.Array      # [B, T] int32 wordpiece ids, T multiple of 510
    token_mask: jax.Array  # [B, T] int32/bool validity
    seg_ids: jax.Array     # [B, T] int32 segment index per token
    boxes: jax.Array       # [B, S, 4] int32 (x0, y0, x1, y1), resized coords
    box_mask: jax.Array    # [B, S] bool
    seg_classes: jax.Array # [B, S] int32 field-type class per segment


@flax.struct.dataclass
class ModelOutput:
    total_loss: Any        # scalar or None
    pred_mask: Any         # [B, H, W, 3] seg pos/neg logits or None
    pred_ss: Any           # [B, H, W, C] seg class logits or None
    gt_label: jax.Array    # [B, S]
    pred_label: jax.Array  # [B, S, C] probabilities, or [B, S] crf tags
    # Loss decomposition (diagnostics; None when compute_loss=False):
    # total_loss = loss_c + λ·loss_aux (ref ViBERTgrid_net.py:539).
    loss_c: Any = None     # field-type classification loss
    loss_aux: Any = None   # auxiliary segmentation loss (pre-λ)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model-structure knobs, mirroring the reference constructor args
    (``model/ViBERTgrid_net.py:128-159``) and ``example_config.yaml``."""

    num_classes: int = 5
    bert_version: str = "bert-base-uncased"
    backbone: str = "resnet_18_fpn"
    grid_mode: str = "mean"                    # 'mean' | 'first'
    early_fusion_downsampling_ratio: int = 8
    roi_shape: int = 7
    p_fuse_downsampling_ratio: int = 4
    late_fusion_fuse_embedding_channel: int = 1024
    classifier_mode: str = "simp"              # 'full' | 'simp' | 'crf'
    tag_to_idx: Any = None                     # dict for crf / BIO modes
    layer_mode: str = "single"                 # 'single' | 'multi'
    # full-head eval decision rule: 'reference' (metric parity; argmax can
    # return background on gate-vs-class saturation ties) or 'gated' (the
    # paper's intent) — see models/heads.py FieldTypeClassification.
    full_head_decision: str = "reference"
    add_pos_neg: bool = True
    loss_weights: Any = None
    loss_control_lambda: float = 1.0
    num_hard_positive_main_1: int = -1
    num_hard_negative_main_1: int = -1
    num_hard_positive_main_2: int = -1
    num_hard_negative_main_2: int = -1
    loss_aux_sample_list: Any = None
    num_hard_positive_aux: int = -1
    num_hard_negative_aux: int = -1
    ohem_random: bool = False
    cls_token_id: int = 101
    sep_token_id: int = 102
    compute_dtype: Any = jnp.float32
    attention_impl: str = "auto"               # see TextEncoderConfig
    ffn_impl: str = "auto"                     # see TextEncoderConfig
    mesh: Any = None                           # ("data","model") device mesh
    text_config: TextEncoderConfig | None = None  # override (tests)

    @property
    def num_tokens(self) -> int:
        """Output class count: len(tag_to_idx) when tags are configured
        (BIO / crf modes), else num_classes (ref :169-173)."""
        if self.tag_to_idx is not None:
            return len(self.tag_to_idx)
        return self.num_classes

    def resolved_text_config(self) -> TextEncoderConfig:
        import dataclasses as _dc

        if self.text_config is not None:
            return _dc.replace(
                self.text_config,
                attention_impl=self.attention_impl,
                ffn_impl=self.ffn_impl,
                mesh=self.mesh,
            )
        if self.bert_version not in BERT_MODEL_REGISTRY:
            raise ValueError(
                f"unknown bert_version {self.bert_version!r}; "
                f"available: {sorted(BERT_MODEL_REGISTRY)}"
            )
        _, flavor = BERT_MODEL_REGISTRY[self.bert_version]
        vocab = {
            "private_bert-base-uncased": 30522,
            "bert-base-uncased": 30522,
            "bert-base-cased": 28996,
            "bert-base-chinese": 21128,
            "hfl/chinese-bert-wwm-ext": 21128,
            "hfl/chinese-bert-wwm": 21128,
            "roberta-base": 50265,
            "tiny-bert-test": 512,
            "tiny-roberta-test": 512,
        }[self.bert_version]
        if self.bert_version in ("tiny-bert-test", "tiny-roberta-test"):
            cfg = TextEncoderConfig.tiny(flavor)
        else:
            cfg = TextEncoderConfig.base(flavor, vocab)
        return _dc.replace(
            cfg,
            attention_impl=self.attention_impl,
            ffn_impl=self.ffn_impl,
            mesh=self.mesh,
        )

    @staticmethod
    def from_yaml_dict(hyp: dict) -> "ModelConfig":
        """Build from a reference-compatible YAML dict (example_config.yaml)."""
        return ModelConfig(
            num_classes=hyp["num_classes"],
            bert_version=hyp["bert_version"],
            backbone=hyp["backbone"],
            grid_mode=hyp.get("grid_mode", "mean"),
            early_fusion_downsampling_ratio=hyp.get(
                "early_fusion_downsampling_ratio", 8
            ),
            roi_shape=hyp.get("roi_shape", 7),
            p_fuse_downsampling_ratio=hyp.get("p_fuse_downsampling_ratio", 4),
            late_fusion_fuse_embedding_channel=hyp.get(
                "late_fusion_fuse_embedding_channel", 1024
            ),
            classifier_mode=hyp.get("classifier_mode", "simp"),
            tag_to_idx=hyp.get("tag_to_idx"),
            layer_mode=hyp.get("layer_mode", "single"),
            full_head_decision=hyp.get("full_head_decision", "reference"),
            add_pos_neg=hyp.get("add_pos_neg", True),
            loss_weights=hyp.get("loss_weights"),
            loss_control_lambda=hyp.get("loss_control_lambda", 1.0),
            num_hard_positive_main_1=hyp.get("num_hard_positive_main_1", -1),
            num_hard_negative_main_1=hyp.get("num_hard_negative_main_1", -1),
            num_hard_positive_main_2=hyp.get("num_hard_positive_main_2", -1),
            num_hard_negative_main_2=hyp.get("num_hard_negative_main_2", -1),
            loss_aux_sample_list=hyp.get("loss_aux_sample_list"),
            num_hard_positive_aux=hyp.get("num_hard_positive_aux", -1),
            num_hard_negative_aux=hyp.get("num_hard_negative_aux", -1),
            ohem_random=hyp.get("ohem_random", False),
            compute_dtype=jnp.bfloat16 if hyp.get("amp", False) else jnp.float32,
            attention_impl=hyp.get("attention_impl", "auto"),
            ffn_impl=hyp.get("ffn_impl", "auto"),
        )


class ViBERTgridNet(nn.Module):
    """See module docstring. ``__call__(batch, train, compute_loss, key)``."""

    config: ModelConfig

    @nn.compact
    def __call__(
        self,
        batch: Batch,
        *,
        train: bool = False,
        compute_loss: bool = True,
        key: jax.Array | None = None,
    ) -> ModelOutput:
        cfg = self.config
        dtype = cfg.compute_dtype
        b, h, w, _ = batch.images.shape
        s = batch.boxes.shape[1]
        gs = cfg.early_fusion_downsampling_ratio
        assert h % 32 == 0 and w % 32 == 0, "image bucket must be /32"

        if key is None:
            key = jax.random.PRNGKey(0)
        k_seg, k_head = jax.random.split(key)

        # --- BERT embedding over folded windows (ops/windows.py) ---
        text_cfg = cfg.resolved_text_config()
        # seq_len = the batch-max valid token count — the width the
        # reference's pad_sequence corpus would have, which pins where each
        # window's [SEP] lands (BERTgrid_generator.py:106-129; the final
        # window is [CLS] slice [SEP] pads, NOT SEP-at-end).
        ids, amask = frame_windows(
            batch.tokens,
            batch.token_mask,
            cls_id=cfg.cls_token_id,
            sep_id=cfg.sep_token_id,
            seq_len=jnp.max(jnp.sum(batch.token_mask.astype(jnp.int32), 1)),
        )
        tok_emb = TextEncoder(text_cfg, dtype, name="bert_model")(
            ids, amask, deterministic=not train
        )
        tok_emb = unframe_windows(tok_emb, batch_size=b)  # [B, T, D]

        # --- token → segment aggregation (ops/segments.py) ---
        seg_emb = aggregate_token_embeddings(
            tok_emb.astype(jnp.float32),
            batch.seg_ids,
            batch.token_mask,
            num_segments=s,
            mode=cfg.grid_mode,
        )  # [B, S, D]

        # --- BERTgrid scatter ---
        # Scatter in the compute dtype: the grid feeds straight into the bf16
        # backbone, so a fp32 grid would just double the HBM traffic of the
        # largest intermediate (75 MB at bench shapes) before being cast.
        # On TPU the fused Pallas kernel (single-pass winner map + one-hot
        # MXU contraction, custom transposed-gather VJP) beats the XLA
        # winner-map path by ~25%; off-TPU the XLA path is used.
        if jax.default_backend() == "tpu":
            from vibertgrid_tpu.ops.pallas_scatter import bertgrid_scatter_pallas

            scatter = lambda e, bx, m: bertgrid_scatter_pallas(
                e, bx, m, height=h // gs, width=w // gs, stride=gs
            )
        else:
            scatter = lambda e, bx, m: bertgrid_scatter(
                e, bx, m, height=h // gs, width=w // gs, stride=gs
            )
        grid = jax.vmap(scatter)(
            seg_emb.astype(dtype), batch.boxes, batch.box_mask
        )  # [B, H/gs, W/gs, D]

        # --- CNN backbone with early fusion ---
        backbone_kw = BACKBONE_REGISTRY[cfg.backbone]
        p_fuse = ResNetFPN(dtype=dtype, name="backbone", **backbone_kw)(
            batch.images, grid, train
        )  # [B, H/4, W/4, 256]

        # --- auxiliary semantic segmentation head ---
        loss_aux = jnp.zeros((), jnp.float32)
        pred_mask = pred_ss = None
        if compute_loss:
            seg_cls = (
                SimplifiedSemanticSegmentationHead
                if cfg.classifier_mode == "simp"
                else SemanticSegmentationHead
            )
            loss_aux, pred_mask, pred_ss = seg_cls(
                num_classes=cfg.num_tokens,
                loss_1_sample_list=cfg.loss_aux_sample_list,
                num_hard_positive=cfg.num_hard_positive_aux,
                num_hard_negative=cfg.num_hard_negative_aux,
                loss_weights=cfg.loss_weights,
                dtype=dtype,
                name="semantic_segmentation_head",
            )(
                p_fuse,
                batch.seg_classes,
                batch.boxes,
                batch.box_mask,
                train=train,
                key=k_seg,
            )

        # --- RoIAlign + late fusion ---
        rois = roi_align(
            p_fuse,
            batch.boxes.astype(jnp.float32),
            batch.box_mask,
            output_size=cfg.roi_shape,
            spatial_scale=1.0 / cfg.p_fuse_downsampling_ratio,
        )  # [B, S, 7, 7, 256]
        rois_flat = rois.reshape(b * s, cfg.roi_shape, cfg.roi_shape, -1)
        valid_flat = batch.box_mask.reshape(b * s)
        fuse = LateFusion(dtype=dtype, name="late_fusion")(
            rois_flat, seg_emb.reshape(b * s, -1), valid_flat, train
        )  # [B·S, 1024]

        # --- field-type classification head ---
        classes_flat = batch.seg_classes.reshape(b * s)
        if cfg.classifier_mode == "crf":
            lengths = jnp.sum(batch.box_mask.astype(jnp.int32), axis=1)
            loss_c, gt, pred = CRFFieldTypeClassification(
                num_classes=cfg.num_tokens,
                layer_mode=cfg.layer_mode,
                dtype=dtype,
                name="field_type_head",
            )(
                fuse.reshape(b, s, -1),
                batch.seg_classes,
                lengths,
                train=train,
                compute_loss=compute_loss,
                key=k_head,
            )
            gt_label, pred_label = gt, pred
        else:
            head_cls = (
                SimplifiedFieldTypeClassification
                if cfg.classifier_mode == "simp"
                else FieldTypeClassification
            )
            kw = dict(
                num_classes=cfg.num_tokens,
                layer_mode=cfg.layer_mode,
                num_hard_positive_1=cfg.num_hard_positive_main_1,
                num_hard_negative_1=cfg.num_hard_negative_main_1,
                num_hard_positive_2=cfg.num_hard_positive_main_2,
                num_hard_negative_2=cfg.num_hard_negative_main_2,
                ohem_random=cfg.ohem_random,
                dtype=dtype,
            )
            if cfg.classifier_mode == "simp":
                kw.update(
                    add_pos_neg=cfg.add_pos_neg, loss_weights=cfg.loss_weights
                )
            else:
                kw.update(decision=cfg.full_head_decision)
            loss_c, gt, pred = head_cls(name="field_type_head", **kw)(
                fuse,
                classes_flat,
                valid_flat,
                train=train,
                compute_loss=compute_loss,
                key=k_head,
            )
            gt_label = gt.reshape(b, s)
            pred_label = pred.reshape(b, s, -1)

        total_loss = None
        if compute_loss:
            total_loss = loss_c + cfg.loss_control_lambda * loss_aux
        return ModelOutput(
            total_loss=total_loss,
            pred_mask=pred_mask,
            pred_ss=pred_ss,
            gt_label=gt_label,
            pred_label=pred_label,
            loss_c=loss_c if compute_loss else None,
            loss_aux=loss_aux if compute_loss else None,
        )
