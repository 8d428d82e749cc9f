"""Per-component INFERENCE timing + XLA cost analysis at bench shapes.

The bench headline (bench.py) is the eval-mode forward: it runs at ~476 GB/s
vs the train step's 608 GB/s (tools/roofline_proof.py) — this tool localizes
the slack: for each component of the inference graph it reports measured
ms/batch (on-device fori_loop, every input leg loop-carried, single scalar
fetch — see docs/ARCHITECTURE.md "Benchmark integrity") next to the
byte-roofline and MXU ideals from XLA cost analysis.

Usage: python tools/infer_breakdown.py   (env ITERS=, B=)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("ITERS", "200"))
B = int(os.environ.get("B", "16"))
H, W, T, S = 512, 384, 510, 128
DTYPE = jnp.bfloat16
HBM_GBPS = 794e9  # measured v5e HBM roofline (docs/ARCHITECTURE.md)
MXU_FLOPS = 186.8e12  # measured bf16 matmul peak (tools/mxu_calib.py)


from tools._timing import make_loop, make_timed

timed = make_timed(ITERS)
loop = make_loop(ITERS)


def cost(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from __graft_entry__ import _make_batch
    from vibertgrid_tpu.models import ModelConfig, ViBERTgridNet
    from vibertgrid_tpu.models.bert import TextEncoder, TextEncoderConfig
    from vibertgrid_tpu.models.heads import (
        LateFusion,
        SimplifiedFieldTypeClassification,
    )
    from vibertgrid_tpu.models.resnet_fpn import BACKBONE_REGISTRY, ResNetFPN
    from vibertgrid_tpu.ops import roi_align
    from vibertgrid_tpu.ops.pallas_scatter import bertgrid_scatter_pallas

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    rows = []

    def report(name, body, cost_fn, cost_args, *timed_args):
        ms = timed(loop(body), *timed_args)
        fl, by = cost(cost_fn, *cost_args)
        rows.append((name, ms, fl, by))

    # ---- whole inference forward (the bench.py graph) ----
    cfg = ModelConfig(
        num_classes=5,
        bert_version="bert-base-uncased",
        backbone="resnet_34_fpn",
        classifier_mode="simp",
        compute_dtype=DTYPE,
    )
    model = ViBERTgridNet(cfg)
    batch = _make_batch(b=B, h=H, w=W, t=T, s=S, vocab=30522)
    variables = jax.jit(
        lambda k, b: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            b, train=False, compute_loss=False, key=jax.random.PRNGKey(2),
        )
    )(jax.random.PRNGKey(0), batch)

    def whole(c, v, bt):
        delta = (c > 1e30).astype(jnp.int32)
        b2 = bt.replace(
            images=bt.images + c * 1e-9,
            tokens=bt.tokens + delta,
            boxes=bt.boxes + delta,
        )
        out = model.apply(
            v, b2, train=False, compute_loss=False, key=jax.random.PRNGKey(0)
        ).pred_label
        return jnp.mean(out.astype(jnp.float32))

    report(
        "WHOLE inference fwd",
        whole,
        lambda v, bt: model.apply(
            v, bt, train=False, compute_loss=False, key=jax.random.PRNGKey(0)
        ).pred_label,
        (variables, batch),
        variables,
        batch,
    )

    # ---- BERT encoder, eval mode ----
    enc = TextEncoder(TextEncoderConfig.base("bert", 30522), DTYPE)
    ids = jnp.asarray(rng.integers(3, 30000, (B, 512)), jnp.int32)
    am = jnp.ones((B, 512), jnp.int32)
    ev = enc.init({"params": key, "dropout": key}, ids, am)

    def bert_fwd(c, v):
        out = enc.apply(v, ids + (c > 1e30).astype(jnp.int32), am)
        return jnp.mean(out.astype(jnp.float32))

    report(
        "bert fwd (eval)",
        bert_fwd,
        lambda v: enc.apply(v, ids, am),
        (ev,),
        ev,
    )

    # ---- ResNet-34 FPN, eval mode (running BN stats) ----
    bk = ResNetFPN(dtype=DTYPE, **BACKBONE_REGISTRY["resnet_34_fpn"])
    img = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
    grid = jnp.asarray(rng.standard_normal((B, H // 8, W // 8, 768)), DTYPE)
    bv = bk.init(key, img, grid, False)

    def bb_fwd(c, v):
        out = bk.apply(v, img + c * 1e-9, grid, False)
        return jnp.mean(out.astype(jnp.float32))

    report(
        "resnet34-fpn fwd (eval)",
        bb_fwd,
        lambda v: bk.apply(v, img, grid, False),
        (bv,),
        bv,
    )

    # ---- BERTgrid scatter ----
    emb = jnp.asarray(rng.standard_normal((B, S, 768)), DTYPE)
    boxes = jnp.asarray(rng.integers(0, 300, (B, S, 4)), jnp.int32)
    boxes = boxes.at[:, :, 2:].set(boxes[:, :, :2] + 24)
    bm = jnp.ones((B, S), bool)

    def scat(e):
        return jax.vmap(
            lambda ee, bb, mm: bertgrid_scatter_pallas(
                ee, bb, mm, height=H // 8, width=W // 8, stride=8
            )
        )(e, boxes, bm)

    def scat_fwd(c, e):
        return jnp.mean(scat(e + c.astype(DTYPE) * 0).astype(jnp.float32)) + c * 0.5

    report("scatter fwd", scat_fwd, lambda e: scat(e), (emb,), emb)

    # (the aux seg head is skipped in inference — compute_loss=False drops
    # it from the graph, matching the reference's inference work mode)
    pf = jnp.asarray(rng.standard_normal((B, H // 4, W // 4, 256)), DTYPE)
    segc = jnp.asarray(rng.integers(0, 5, (B, S)), jnp.int32)

    # ---- RoIAlign + late fusion + simp head, inference ----
    lf = LateFusion(dtype=DTYPE)
    fh = SimplifiedFieldTypeClassification(
        num_classes=5, num_hard_positive_1=32, num_hard_negative_1=32,
        num_hard_positive_2=32, num_hard_negative_2=32, dtype=DTYPE)
    semb = jnp.asarray(rng.standard_normal((B * S, 768)), jnp.float32)
    vmask = jnp.ones((B * S,), bool)
    rois0 = roi_align(pf, boxes.astype(jnp.float32), bm, output_size=7,
                      spatial_scale=0.25)
    lv = lf.init(key, rois0.reshape(B * S, 7, 7, -1), semb, vmask, False)
    fuse0 = lf.apply(lv, rois0.reshape(B * S, 7, 7, -1), semb, vmask, False)
    fv = fh.init({"params": key, "dropout": key}, fuse0,
                 segc.reshape(-1), vmask, train=False, compute_loss=False,
                 key=key)

    def head_path(x):
        r = roi_align(x, boxes.astype(jnp.float32), bm, output_size=7,
                      spatial_scale=0.25)
        f = lf.apply(lv, r.reshape(B * S, 7, 7, -1), semb, vmask, False)
        out = fh.apply(fv, f, segc.reshape(-1), vmask, train=False,
                       compute_loss=False, key=key)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.mean(x.astype(jnp.float32)) for x in leaves)

    def head_fwd(c, _pf):
        return head_path(_pf + c.astype(DTYPE) * 0) + c * 0.5

    report(
        "roi+fuse+head fwd (infer)",
        head_fwd,
        lambda x: head_path(x),
        (pf,),
        pf,
    )

    print(f"\nB={B} ITERS={ITERS}  (ideals: {HBM_GBPS/1e9:.0f} GB/s HBM, "
          f"{MXU_FLOPS/1e12:.0f} TF/s MXU)")
    print(f"{'component':28s} {'ms':>8s} {'GFLOP':>8s} {'GB':>7s} "
          f"{'@HBM':>7s} {'@MXU':>7s} {'GB/s':>6s}")
    for name, ms, fl, by in rows:
        print(
            f"{name:28s} {ms:8.2f} {fl / 1e9:8.1f} {by / 1e9:7.2f} "
            f"{by / HBM_GBPS * 1e3:7.2f} {fl / MXU_FLOPS * 1e3:7.2f} "
            f"{by / (ms / 1e3) / 1e9:6.0f}"
        )
    parts = sum(ms for name, ms, *_ in rows if not name.startswith("WHOLE"))
    print(f"{'sum of components':28s} {parts:8.2f}")


if __name__ == "__main__":
    main()
