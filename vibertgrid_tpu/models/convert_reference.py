"""Load a trained ViBERTgrid-PyTorch checkpoint into this model.

Migration path for users of the reference implementation: a torch
``state_dict`` saved by ``ZeningLin/ViBERTgrid-PyTorch`` (the ``"model"``
entry of its checkpoint dict, ``train_SROIE.py:383-403``; an optional DDP
``module.`` prefix is stripped like ``eval_SROIE.py:336-337``) maps onto
this package's flax variables — weights, biases, and BatchNorm running
statistics — for all three classifier modes.

Name map (reference module attribute names from
``model/ViBERTgrid_net.py.__init__`` and submodules; layout conversions:
conv OIHW→HWIO, linear ``[out,in]``→``[in,out]``):

- ``bert_model.*`` → the text encoder via
  :func:`vibertgrid_tpu.models.bert.load_hf_weights` (the duplicate alias
  ``BERTgrid_generator.model.*`` registers the same tensors and is
  ignored; so is the unused ``pooler``).
- ``backbone.conv_1.{0,1}`` → ``stem_conv``/``stem_bn``;
  ``conv_2_x.{i}`` → ``stage2_block{i}``;
  ``conv_3_x.block_1`` → ``stage3_block0``, ``conv_3_x.early_fusion`` →
  ``early_fusion``, ``conv_3_x.layers.{i}`` → ``stage3_block{i+1}``
  (``ResNetFPN_ViBERTgrid.py:272-321`` — the early-fusion splice sits
  after the stage's first block);
  ``conv_4_x.{i}``/``conv_5_x.{i}`` → ``stage4/5_block{i}``;
  block leaves ``conv_1/bn_1/conv_2/bn_2/conv_shortcut.{0,1}`` →
  ``conv1/bn1/conv2/bn2/shortcut_conv/shortcut_bn``;
  ``conv_6_x``/``skip_k``/``merge_k``/``fuse`` → ``conv6``/``skip{k}``/
  ``merge{k}``/``fuse`` (the concat-free P_fuse keeps the reference's
  single ``[1,1,1024,256]`` kernel and level order — see
  ``resnet_fpn._SplitPointwise``).
- ``late_fusion_net.ROI_embedding_net.*`` → ``late_fusion/roi_embedding``;
  its ``linear`` consumed a CHW flatten of the 7×7 RoI map, ours consumes
  HWC — the kernel's input axis is re-permuted accordingly.
  ``late_fusion_net.fuse_embedding_net.linear`` → ``late_fusion/fuse``
  (concat order ROI‖BERT matches, ``field_type_classification_head.py:185``).
- ``semantic_segmentation_head.{semantic_segmentation_encoder|ss_encoder}``
  → ``semantic_segmentation_head/encoder`` (``conv_3_1``→``mask_proj``,
  ``conv_3_2``→``class_proj``); the full head's per-class
  ``ss_binary_classifier_{i}.conv1`` 1×1 convs stack into ``binary_bank``.
- ``field_type_classification_head``:
  simp — ``pos_neg_classification_net``/``category_classification_net``
  ``linear_1/linear_2`` → ``pos_neg_net``/``category_net`` ``hidden/out``
  (the reference's simplified head is ALWAYS the two-layer MLP — the
  "sigle" typo at :474 — and so is ours);
  full — ``pos_neg_classification_net.layer`` → ``pos_neg_net`` and the
  per-class ``category_classification_net_{i}.layer`` single layers stack
  into ``category_net`` columns (``layer_mode="multi"`` full checkpoints
  use per-class hidden layers with no equivalent here → error);
  crf — ``category_classification_net`` → ``category_net`` and
  ``crf_layer.transitions`` copies directly (identical ``[to, from]``
  layout and START/STOP placement, ``ops/crf.py``).

Scope: the from-scratch ``resnet_18/34_fpn`` and ``resnet_18/34_D_fpn``
registry entries (the D-variant's ``Sequential(AvgPool, conv, bn)``
shortcut maps by index shift). The ``*_pretrained`` variants embed the
torchvision module layout (``backbone.resnet.*``) and raise with a pointer
to ``models.resnet_fpn.load_torchvision_resnet``.
``num_batches_tracked`` counters have no equivalent and are dropped.
"""

from __future__ import annotations

import re

import numpy as np

from vibertgrid_tpu.models.bert import load_hf_weights


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv(w) -> np.ndarray:
    """torch OIHW conv weight → flax HWIO kernel."""
    return _np(w).transpose(2, 3, 1, 0)


def _lin(w) -> np.ndarray:
    """torch [out, in] linear weight → flax [in, out] kernel."""
    return _np(w).T


def _roi_linear(w, h: int = 7, wdt: int = 7, c: int = 256) -> np.ndarray:
    """The RoI-embedding linear: torch flattened CHW, flax flattens HWC —
    permute the input axis before transposing."""
    w = _np(w)  # [out, c*h*w] in (c, h, w) order
    out = w.shape[0]
    w = w.reshape(out, c, h, wdt).transpose(0, 2, 3, 1).reshape(out, -1)
    return w.T


def load_reference_checkpoint(variables: dict, state_dict: dict) -> dict:
    """Map a reference ``state_dict`` onto ``variables`` (params +
    batch_stats). Returns new variables; raises ``KeyError`` on missing
    source keys and ``ValueError`` on unsupported architectures. Every
    converted leaf is shape-checked."""
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }

    if any(k.startswith("backbone.resnet.") for k in sd):
        raise ValueError(
            "torchvision-pretrained trunk checkpoints use the torchvision "
            "module layout; load them with "
            "models.resnet_fpn.load_torchvision_resnet conventions"
        )

    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def set_in(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        old = node[path[-1]]
        value = np.asarray(value, old.dtype)
        assert old.shape == value.shape, (path, old.shape, value.shape)
        node[path[-1]] = value

    def put_p(path, value):
        set_in(params, path, value)

    def put_s(path, value):
        set_in(stats, path, value)

    def conv_bn(src_conv, src_bn, dst, name_conv, name_bn):
        put_p(dst + [name_conv, "kernel"], _conv(sd[src_conv + ".weight"]))
        put_p(dst + [name_bn, "scale"], _np(sd[src_bn + ".weight"]))
        put_p(dst + [name_bn, "bias"], _np(sd[src_bn + ".bias"]))
        put_s(dst + [name_bn, "mean"], _np(sd[src_bn + ".running_mean"]))
        put_s(dst + [name_bn, "var"], _np(sd[src_bn + ".running_var"]))

    # ---- text encoder (reuses the HF ingester; keys live at bert_model.*)
    bert_sd = {
        k[len("bert_model."):]: v
        for k, v in sd.items()
        if k.startswith("bert_model.") and ".pooler." not in k
    }
    n_layers = 1 + max(
        int(m.group(1))
        for k in bert_sd
        if (m := re.match(r"encoder\.layer\.(\d+)\.", k))
    )
    params["bert_model"] = load_hf_weights(
        params["bert_model"], bert_sd, n_layers
    )

    # ---- backbone ----
    b = "backbone"
    conv_bn(f"{b}.conv_1.0", f"{b}.conv_1.1", ["backbone"], "stem_conv",
            "stem_bn")

    def block(src, dst_name):
        dst = ["backbone", dst_name]
        conv_bn(f"{src}.conv_1", f"{src}.bn_1", dst, "conv1", "bn1")
        conv_bn(f"{src}.conv_2", f"{src}.bn_2", dst, "conv2", "bn2")
        if f"{src}.conv_shortcut.0.weight" in sd:
            # plain BasicBlock: Sequential(conv, bn)
            conv_bn(f"{src}.conv_shortcut.0", f"{src}.conv_shortcut.1", dst,
                    "shortcut_conv", "shortcut_bn")
        elif f"{src}.conv_shortcut.1.weight" in sd:
            # D-variant: Sequential(AvgPool, conv, bn)
            # (ResNetFPN_ViBERTgrid.py:213-231; ours matches the topology)
            conv_bn(f"{src}.conv_shortcut.1", f"{src}.conv_shortcut.2", dst,
                    "shortcut_conv", "shortcut_bn")

    def stage_indices(prefix):
        idx = set()
        for k in sd:
            m = re.match(rf"{re.escape(prefix)}\.(\d+)\.", k)
            if m:
                idx.add(int(m.group(1)))
        return sorted(idx)

    for i in stage_indices(f"{b}.conv_2_x"):
        block(f"{b}.conv_2_x.{i}", f"stage2_block{i}")
    block(f"{b}.conv_3_x.block_1", "stage3_block0")
    put_p(["backbone", "early_fusion", "kernel"],
          _conv(sd[f"{b}.conv_3_x.early_fusion.weight"]))
    if f"{b}.conv_3_x.early_fusion.bias" in sd:
        put_p(["backbone", "early_fusion", "bias"],
              _np(sd[f"{b}.conv_3_x.early_fusion.bias"]))
    for i in stage_indices(f"{b}.conv_3_x.layers"):
        block(f"{b}.conv_3_x.layers.{i}", f"stage3_block{i + 1}")
    for stage in (4, 5):
        for i in stage_indices(f"{b}.conv_{stage}_x"):
            block(f"{b}.conv_{stage}_x.{i}", f"stage{stage}_block{i}")

    put_p(["backbone", "conv6", "kernel"], _conv(sd[f"{b}.conv_6_x.weight"]))
    for k in (1, 2, 3):
        put_p(["backbone", f"skip{k}", "kernel"],
              _conv(sd[f"{b}.skip_{k}.weight"]))
        put_p(["backbone", f"merge{k}", "kernel"],
              _conv(sd[f"{b}.merge_{k}.weight"]))
    put_p(["backbone", "fuse", "kernel"], _conv(sd[f"{b}.fuse.weight"]))

    # ---- late fusion ----
    lf = "late_fusion_net.ROI_embedding_net"
    dst = ["late_fusion", "roi_embedding"]
    conv_bn(f"{lf}.conv_1", f"{lf}.bn_1", dst, "conv1", "bn1")
    conv_bn(f"{lf}.conv_2", f"{lf}.bn_2", dst, "conv2", "bn2")
    put_p(dst + ["linear", "kernel"], _roi_linear(sd[f"{lf}.linear.weight"]))
    put_p(dst + ["linear", "bias"], _np(sd[f"{lf}.linear.bias"]))
    put_p(["late_fusion", "fuse", "kernel"],
          _lin(sd["late_fusion_net.fuse_embedding_net.linear.weight"]))
    put_p(["late_fusion", "fuse", "bias"],
          _np(sd["late_fusion_net.fuse_embedding_net.linear.bias"]))

    # ---- aux segmentation head (absent in inference-mode checkpoints) ----
    sseg = "semantic_segmentation_head"
    enc = (
        f"{sseg}.semantic_segmentation_encoder"
        if f"{sseg}.semantic_segmentation_encoder.conv_1.weight" in sd
        else f"{sseg}.ss_encoder"
    )
    if f"{enc}.conv_1.weight" in sd and "semantic_segmentation_head" in params:
        dst = ["semantic_segmentation_head", "encoder"]
        conv_bn(f"{enc}.conv_1", f"{enc}.bn_1", dst, "conv1", "bn1")
        conv_bn(f"{enc}.conv_2", f"{enc}.bn_2", dst, "conv2", "bn2")
        for src, name in (("conv_3_1", "mask_proj"), ("conv_3_2", "class_proj")):
            put_p(dst + [name, "kernel"], _conv(sd[f"{enc}.{src}.weight"]))
            put_p(dst + [name, "bias"], _np(sd[f"{enc}.{src}.bias"]))
        bins = stage_indices_like(sd, f"{sseg}.ss_binary_classifier_")
        if bins:
            w = np.concatenate(
                [_conv(sd[f"{sseg}.ss_binary_classifier_{i}.conv1.weight"])
                 for i in bins],
                axis=-1,
            )
            bias = np.concatenate(
                [_np(sd[f"{sseg}.ss_binary_classifier_{i}.conv1.bias"])
                 for i in bins]
            )
            put_p(["semantic_segmentation_head", "binary_bank", "kernel"], w)
            put_p(["semantic_segmentation_head", "binary_bank", "bias"], bias)

    # ---- field-type head ----
    fh = "field_type_classification_head"
    if f"{fh}.crf_layer.transitions" in sd:  # crf mode
        cat = f"{fh}.category_classification_net"
        if f"{cat}.linear.weight" in sd:  # single layer
            put_p(["field_type_head", "category_net", "out", "kernel"],
                  _lin(sd[f"{cat}.linear.weight"]))
            put_p(["field_type_head", "category_net", "out", "bias"],
                  _np(sd[f"{cat}.linear.bias"]))
        else:  # multi
            put_p(["field_type_head", "category_net", "hidden", "kernel"],
                  _lin(sd[f"{cat}.linear_1.weight"]))
            put_p(["field_type_head", "category_net", "hidden", "bias"],
                  _np(sd[f"{cat}.linear_1.bias"]))
            put_p(["field_type_head", "category_net", "out", "kernel"],
                  _lin(sd[f"{cat}.linear_2.weight"]))
            put_p(["field_type_head", "category_net", "out", "bias"],
                  _np(sd[f"{cat}.linear_2.bias"]))
        put_p(["field_type_head", "transitions"],
              _np(sd[f"{fh}.crf_layer.transitions"]))
    elif f"{fh}.category_classification_net_0.layer.linear.weight" in sd:
        # full (two-stage) mode: per-class single layers stack into columns
        if f"{fh}.category_classification_net_0.layer.linear_1.weight" in sd:
            raise ValueError(
                "full-mode checkpoints with layer_mode='multi' use per-class "
                "hidden layers with no equivalent here (the shared-hidden "
                "formulation differs); retrain or use layer_mode='single'"
            )
        idx = stage_indices_like(sd, f"{fh}.category_classification_net_")
        w = np.concatenate(
            [_lin(sd[f"{fh}.category_classification_net_{i}.layer.linear.weight"])
             for i in idx],
            axis=-1,
        )
        bias = np.concatenate(
            [_np(sd[f"{fh}.category_classification_net_{i}.layer.linear.bias"])
             for i in idx]
        )
        put_p(["field_type_head", "category_net", "out", "kernel"], w)
        put_p(["field_type_head", "category_net", "out", "bias"], bias)
        pn = f"{fh}.pos_neg_classification_net.layer"
        if f"{pn}.linear.weight" in sd:
            put_p(["field_type_head", "pos_neg_net", "out", "kernel"],
                  _lin(sd[f"{pn}.linear.weight"]))
            put_p(["field_type_head", "pos_neg_net", "out", "bias"],
                  _np(sd[f"{pn}.linear.bias"]))
        elif f"{pn}.linear_1.weight" in sd:
            raise ValueError(
                "full-mode checkpoints with layer_mode='multi' are not "
                "mapped (see category net error above)"
            )
    elif f"{fh}.category_classification_net.linear_1.weight" in sd:
        # simplified mode (always the two-layer MLP — the "sigle" typo)
        for src, dst_name in (
            ("pos_neg_classification_net", "pos_neg_net"),
            ("category_classification_net", "category_net"),
        ):
            put_p(["field_type_head", dst_name, "hidden", "kernel"],
                  _lin(sd[f"{fh}.{src}.linear_1.weight"]))
            put_p(["field_type_head", dst_name, "hidden", "bias"],
                  _np(sd[f"{fh}.{src}.linear_1.bias"]))
            put_p(["field_type_head", dst_name, "out", "kernel"],
                  _lin(sd[f"{fh}.{src}.linear_2.weight"]))
            put_p(["field_type_head", dst_name, "out", "bias"],
                  _np(sd[f"{fh}.{src}.linear_2.bias"]))
    else:
        raise ValueError(
            "could not identify the classifier mode from the state dict "
            "(no crf_layer, category_classification_net_0, or "
            "category_classification_net.linear_1 keys)"
        )

    import jax.numpy as jnp

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    out["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, stats)
    return out


def stage_indices_like(sd: dict, prefix: str) -> list[int]:
    """Sorted distinct integer suffixes following ``prefix`` in key names."""
    idx = set()
    for k in sd:
        m = re.match(rf"{re.escape(prefix)}(\d+)\.", k)
        if m:
            idx.add(int(m.group(1)))
    return sorted(idx)
