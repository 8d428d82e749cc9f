"""Auxiliary semantic segmentation heads.

Rebuild of ``/root/reference/model/semantic_segmentation_head.py``: an
encoder of two 3×3 conv+BN+ReLU, 4× nearest upsampling back to stride 1, and
two 1×1 projection heads — a 3-way background/key/other mask and a C-way
class map (ref :23-78) — followed by either the paper's two-stage per-class
binary classification gated on the predicted positive mask (ref :100-233) or
the simplified pair of multi-class losses (ref :236-352).

Pixel labels are rasterized on-device from segment boxes by the winner-map
primitive (:func:`vibertgrid_tpu.ops.rasterize_label_maps`), replacing the
reference's nested Python loops (ref :199-214, :326-341).

TPU optimization: 1×1 convolutions commute with nearest upsampling, so every
projection runs on the stride-4 map and only the final (cheap, few-channel)
logits are upsampled — 16× less conv work and no [B, H, W, 256] full-res
intermediate, with bit-identical outputs.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from vibertgrid_tpu.models.norm import BatchNorm
from vibertgrid_tpu.ops.rasterize import rasterize_label_maps
from vibertgrid_tpu.ops.losses import (
    bce_ohem_pooled,
    cross_entropy_ohem_pooled,
    cross_entropy_random_sample_pooled,
)


def _upsample_nearest(x, scale):
    return x.repeat(scale, axis=1).repeat(scale, axis=2)


class _SegEncoder(nn.Module):
    """Shared encoder + projections, all at stride 4 (see module docstring)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p_fuse, train: bool = False):
        x = p_fuse.astype(self.dtype)
        for i in range(2):
            x = nn.Conv(
                p_fuse.shape[-1], (3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype, name=f"conv{i + 1}",
            )(x)
            x = BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn{i + 1}",
            )(x)
            x = nn.relu(x)
        mask_logits = nn.Conv(3, (1, 1), dtype=self.dtype, name="mask_proj")(x)
        class_logits = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype, name="class_proj"
        )(x)
        return mask_logits.astype(jnp.float32), class_logits.astype(jnp.float32)


def _labels(seg_classes, boxes, box_mask, height, width):
    return jax.vmap(
        lambda c, b, m: rasterize_label_maps(
            c, b, m, height=height, width=width
        )
    )(seg_classes, boxes, box_mask)


class SemanticSegmentationHead(nn.Module):
    """Two-stage variant (ref ``SemanticSegmentationClassifier`` :100-233)."""

    num_classes: int
    loss_1_sample_list: Any = None
    num_hard_positive: int = -1
    num_hard_negative: int = -1
    loss_weights: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        p_fuse,
        seg_classes,
        boxes,
        box_mask,
        *,
        train: bool = False,
        key: jax.Array | None = None,
    ):
        b, h4, w4, _ = p_fuse.shape
        h, w = h4 * 4, w4 * 4
        mask_logits4, class_logits4 = _SegEncoder(
            self.num_classes, self.dtype, name="encoder"
        )(p_fuse, train)
        # Per-class binary classifiers on the class feature map (ref
        # ``ss_binary_classifier_*`` 1×1 convs :136-158) as one conv bank.
        bin_logits4 = nn.Conv(
            self.num_classes - 1, (1, 1), dtype=self.dtype, name="binary_bank"
        )(class_logits4.astype(self.dtype)).astype(jnp.float32)

        pos_neg, class_map = _labels(seg_classes, boxes, box_mask, h, w)

        # All losses run at stride-4 cell granularity via the *_pooled
        # variants: within a 4×4 tile every pixel shares the cell's logits,
        # so per-pixel losses take few distinct values — the pooled forms are
        # exactly the full-resolution losses (ops/losses.py) at 16× less
        # bandwidth, and no full-res tensor is ever part of the grad graph.
        assert key is not None
        k1, *k2 = jax.random.split(key, self.num_classes + 1)
        loss1 = cross_entropy_random_sample_pooled(
            mask_logits4,
            pos_neg,
            block=4,
            sample_list=self.loss_1_sample_list,
            key=k1,
        )

        # ref gate :221: per-class binary losses over predicted-positive
        # pixels; argmax of upsampled logits == upsample of cell argmax.
        pred_pos4 = jnp.argmax(mask_logits4, axis=-1) == 1  # [B, h4, w4]
        gated = _upsample_nearest(pred_pos4[..., None], 4)[..., 0]  # [B, H, W]
        loss2 = jnp.zeros((), jnp.float32)
        for ci in range(self.num_classes - 1):
            loss2 = loss2 + bce_ohem_pooled(
                bin_logits4[..., ci],
                class_map == ci + 1,
                gated,
                block=4,
                num_hard_positive=self.num_hard_positive,
                num_hard_negative=self.num_hard_negative,
                key=k2[ci],
            )
        any_pos = jnp.any(pred_pos4).astype(jnp.float32)  # ref gate :221
        loss = loss1 + any_pos * loss2
        mask_logits = _upsample_nearest(mask_logits4, 4)
        class_logits = _upsample_nearest(class_logits4, 4)
        return loss, mask_logits, class_logits


class SimplifiedSemanticSegmentationHead(nn.Module):
    """Simplified variant (ref :236-352): two multi-class pixel losses."""

    num_classes: int
    loss_1_sample_list: Any = None
    num_hard_positive: int = -1
    num_hard_negative: int = -1
    loss_weights: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        p_fuse,
        seg_classes,
        boxes,
        box_mask,
        *,
        train: bool = False,
        key: jax.Array | None = None,
    ):
        b, h4, w4, _ = p_fuse.shape
        h, w = h4 * 4, w4 * 4
        mask_logits4, class_logits4 = _SegEncoder(
            self.num_classes, self.dtype, name="encoder"
        )(p_fuse, train)

        pos_neg, class_map = _labels(seg_classes, boxes, box_mask, h, w)

        # Cell-granularity pooled losses — see the two-stage head above.
        assert key is not None
        k1, k2 = jax.random.split(key)
        loss1 = cross_entropy_random_sample_pooled(
            mask_logits4,
            pos_neg,
            block=4,
            sample_list=self.loss_1_sample_list,
            key=k1,
        )
        loss2 = cross_entropy_ohem_pooled(
            class_logits4,
            class_map,
            block=4,
            num_hard_positive=self.num_hard_positive,
            num_hard_negative=self.num_hard_negative,
            weight=self.loss_weights,
            key=k2,
        )
        mask_logits = _upsample_nearest(mask_logits4, 4)
        class_logits = _upsample_nearest(class_logits4, 4)
        return loss1 + loss2, mask_logits, class_logits
