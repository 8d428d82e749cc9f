"""Late fusion and the three field-type classification heads.

Rebuild of ``/root/reference/model/field_type_classification_head.py``:

- :class:`LateFusion` — ROI embedding (2×[3×3 conv + BN + ReLU] + flatten +
  linear 1024, ref :26-75) concatenated with the segment BERT embedding and
  projected to 1024 (ref :130-190).
- :class:`FieldTypeClassification` — the paper's two-stage design (ref
  :193-407): a binary pos/neg gate trained with randomly sampled BCE, then
  per-class binary classifiers trained with BCE-OHEM *on the predicted
  positives*. The reference's data-dependent gather
  (``pos_fuse_embeddings = fuse[pred_mask]``, :376) becomes a validity mask
  intersection — identical losses, static shapes.
- :class:`SimplifiedFieldTypeClassification` — single multi-class classifier
  + auxiliary 2-way pos/neg head, both CE-OHEM (ref :410-588).
- :class:`CRFFieldTypeClassification` — emission MLP + linear-chain CRF (ref
  :591-718) using the scan-based CRF from :mod:`vibertgrid_tpu.ops.crf`.

Heads operate on flattened ``[N = B·S]`` segment tensors with a ``valid``
mask (padding segments behave as absent); the CRF head keeps ``[B, S]``
structure for its sequence model.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from vibertgrid_tpu.models.norm import MaskedBatchNorm
from vibertgrid_tpu.ops import crf as crf_ops
from vibertgrid_tpu.ops.losses import (
    bce_ohem,
    bce_random_sample,
    cross_entropy_ohem,
)


class MLPClassifier(nn.Module):
    """'single' = one linear layer; 'multi' = linear→ReLU→linear with a
    half-width hidden (ref SingleLayer/MultipleLayer :78-107)."""

    out_features: int
    layer_mode: str = "single"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.layer_mode == "multi":
            x = nn.Dense(x.shape[-1] // 2, dtype=self.dtype, name="hidden")(x)
            x = nn.relu(x)
        return nn.Dense(self.out_features, dtype=self.dtype, name="out")(x)


class ROIEmbedding(nn.Module):
    """RoI feature map → 1024-d vector (ref :26-75), masked BN."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois, valid, train: bool = False):
        # rois: [N, 7, 7, C]; valid: [N]
        x = rois.astype(self.dtype)
        for i in range(2):
            x = nn.Conv(
                rois.shape[-1], (3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype, name=f"conv{i + 1}",
            )(x)
            x = MaskedBatchNorm(dtype=self.dtype, name=f"bn{i + 1}")(x, valid, train)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1024, dtype=self.dtype, name="linear")(x)


class LateFusion(nn.Module):
    """concat(ROI-1024, BERT-768) → linear 1024 (ref :130-190)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rois, bert_embeddings, valid, train: bool = False):
        roi_emb = ROIEmbedding(dtype=self.dtype, name="roi_embedding")(
            rois, valid, train
        )
        fuse = jnp.concatenate(
            [roi_emb, bert_embeddings.astype(roi_emb.dtype)], axis=-1
        )
        return nn.Dense(1024, dtype=self.dtype, name="fuse")(fuse)


class FieldTypeClassification(nn.Module):
    """Two-stage head: pos/neg gate + per-class binary classifiers.

    ``decision`` picks the eval-time class-score layout:

    - ``"reference"`` (default, metric parity): ``class_pred[:, 0] =
      sigmoid(gate)`` exactly as the reference (:376-381) — note this
      makes the downstream argmax (train_val_utils.py:446-447) return
      BACKGROUND whenever the gate's confidence ≥ the true class's
      sigmoid. Once both saturate to 1.0f the tie breaks to index 0, so
      a PERFECTLY trained head scores F1 = 0 on a saturating task
      (tests/test_model.py::test_full_head_standalone_learnability pins
      this); on sub-saturated real data the rule merely suppresses
      predictions whose class confidence trails the gate's.
    - ``"gated"`` (the paper's intent): the background column is the
      gate's NEGATIVE probability (``class_pred[:, 0] = 1 - sigmoid(gate)``),
      which BIASES the argmax toward the gate's own pos/neg decision
      rather than strictly enforcing it: a segment with gate 0.55 still
      maps to background if every class sigmoid < 0.45. Unlike
      ``"reference"``, a jointly saturated head (gate → 1, true class → 1)
      decodes the true class instead of background (ADVICE r4 #2).
    """

    num_classes: int
    layer_mode: str = "single"
    num_hard_positive_1: int = -1
    num_hard_negative_1: int = -1
    num_hard_positive_2: int = -1
    num_hard_negative_2: int = -1
    ohem_random: bool = False
    decision: str = "reference"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        fuse_embeddings,
        segment_classes,
        valid,
        *,
        train: bool = False,
        compute_loss: bool = True,
        key: jax.Array | None = None,
    ):
        n = fuse_embeddings.shape[0]
        c = self.num_classes
        pos_neg_logit = MLPClassifier(
            1, self.layer_mode, self.dtype, name="pos_neg_net"
        )(fuse_embeddings)[:, 0]
        # One vectorized bank of C-1 independent binary classifiers (the
        # reference's AttrProxy module list, :259-289).
        class_logits = MLPClassifier(
            c - 1, self.layer_mode, self.dtype, name="category_net"
        )(fuse_embeddings)  # [N, C-1]

        gate_sig = jax.nn.sigmoid(pos_neg_logit.astype(jnp.float32))
        pred_pos = gate_sig >= 0.5
        # Background score column: the reference rule reuses the gate's
        # POSITIVE probability (quirk, see class docstring); the gated rule
        # uses its complement so the argmax honors the gate's own decision.
        col0 = gate_sig if self.decision == "reference" else 1.0 - gate_sig
        class_pred = jnp.concatenate(
            [
                col0[:, None],
                jnp.where(
                    pred_pos[:, None],
                    jax.nn.sigmoid(class_logits.astype(jnp.float32)),
                    0.0,
                ),
            ],
            axis=1,
        )  # [N, C]

        if not compute_loss:
            return None, segment_classes, class_pred

        assert key is not None
        k1, *k2 = jax.random.split(key, c)
        label_pos = (segment_classes > 0).astype(jnp.float32)
        # L1: BCE with random sampling, sample_list=[neg, pos] (ref :255-257).
        loss1 = bce_random_sample(
            pos_neg_logit,
            label_pos,
            valid,
            sample_list=[self.num_hard_negative_1, self.num_hard_positive_1],
            key=k1,
        )
        # L2: per-class BCE-OHEM on predicted positives (ref :386-396).
        gated = valid & pred_pos
        loss2 = jnp.zeros((), jnp.float32)
        for ci in range(c - 1):
            loss2 = loss2 + bce_ohem(
                class_logits[:, ci],
                (segment_classes == ci + 1).astype(jnp.float32),
                gated,
                num_hard_positive=self.num_hard_positive_2,
                num_hard_negative=self.num_hard_negative_2,
                random=self.ohem_random,
                key=k2[ci],
            )
        # If nothing is predicted positive the reference skips L2 entirely
        # (ref :386); masked losses with empty masks already yield 0.
        any_pos = jnp.any(gated).astype(jnp.float32)
        return loss1 + any_pos * loss2, segment_classes, class_pred


class SimplifiedFieldTypeClassification(nn.Module):
    """Single multi-class classifier + auxiliary pos/neg head (ref :410-588)."""

    num_classes: int
    layer_mode: str = "single"
    num_hard_positive_1: int = -1
    num_hard_negative_1: int = -1
    num_hard_positive_2: int = -1
    num_hard_negative_2: int = -1
    ohem_random: bool = False
    add_pos_neg: bool = True
    loss_weights: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        fuse_embeddings,
        segment_classes,
        valid,
        *,
        train: bool = False,
        compute_loss: bool = True,
        key: jax.Array | None = None,
    ):
        # Preserved reference quirk: the simplified head compares layer_mode
        # against the TYPO "sigle" (field_type_classification_head.py:474),
        # and "sigle" itself fails the validity assert (:466-469) — so the
        # reference ALWAYS builds the two-layer MLP here, including under the
        # shipped configs' layer_mode: "single" (example_config.yaml:71) that
        # produced the published F1 rows. Architecture is metric-affecting:
        # reproduce it. (The full and CRF heads honor "single" correctly in
        # the reference and here.)
        mode = "multi"
        pos_neg_logits = MLPClassifier(
            2, mode, self.dtype, name="pos_neg_net"
        )(fuse_embeddings)
        class_logits = MLPClassifier(
            self.num_classes, mode, self.dtype, name="category_net"
        )(fuse_embeddings)
        class_pred = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)

        if not compute_loss:
            return None, segment_classes, class_pred

        assert key is not None
        k1, k2 = jax.random.split(key)
        loss1 = cross_entropy_ohem(
            pos_neg_logits,
            (segment_classes > 0).astype(jnp.int32),
            valid,
            num_hard_positive=self.num_hard_positive_1,
            num_hard_negative=self.num_hard_negative_1,
            random=self.ohem_random,
            key=k1,
        )
        loss2 = cross_entropy_ohem(
            class_logits,
            segment_classes,
            valid,
            num_hard_positive=self.num_hard_positive_2,
            num_hard_negative=self.num_hard_negative_2,
            weight=self.loss_weights,
            random=self.ohem_random,
            key=k2,
        )
        loss = loss1 + loss2 if self.add_pos_neg else loss2
        return loss, segment_classes, class_pred


class CRFFieldTypeClassification(nn.Module):
    """Emission MLP + CRF NLL / Viterbi decode (ref :591-718).

    Operates on ``[B, S, D]`` fuse embeddings with per-sample lengths
    (``box_mask.sum``); decode output is ``[B, S]`` tag ids.
    """

    num_classes: int  # tag count excluding START/STOP
    layer_mode: str = "single"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        fuse_embeddings,  # [B, S, D]
        segment_classes,  # [B, S]
        lengths,  # [B]
        *,
        train: bool = False,
        compute_loss: bool = True,
        key: jax.Array | None = None,
    ):
        num_tags = self.num_classes + 2
        feats = MLPClassifier(
            num_tags, self.layer_mode, self.dtype, name="category_net"
        )(fuse_embeddings).astype(jnp.float32)
        transitions = self.param(
            "transitions",
            lambda k: crf_ops.init_transitions(k, num_tags),
        )

        if compute_loss and train:
            loss = crf_ops.crf_nll_batch(transitions, feats, segment_classes, lengths)
            return loss, segment_classes, feats
        scores, paths = crf_ops.crf_decode_batch(transitions, feats, lengths)
        if compute_loss:
            # Reference eval mode returns mean Viterbi path score (:702-718).
            return jnp.mean(scores), segment_classes, paths
        return None, segment_classes, paths
