"""Per-component fwd / fwd+bwd timing on the real TPU chip (bench shapes).

Apportions the full-model train-step time (tools/train_breakdown.py) to the
major submodules so optimization effort lands where the milliseconds are.
Same on-device fori_loop + scalar-fetch timing as bench.py.
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
B, H, W, T, S = 8, 512, 384, 510, 128
DTYPE = jnp.bfloat16


from tools._timing import make_loop, make_timed

timed = make_timed(ITERS)
loop = make_loop(ITERS)




def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from vibertgrid_tpu.models.bert import TextEncoder, TextEncoderConfig
    from vibertgrid_tpu.models.resnet_fpn import BACKBONE_REGISTRY, ResNetFPN
    from vibertgrid_tpu.models.seg_head import SimplifiedSemanticSegmentationHead
    from vibertgrid_tpu.models.heads import LateFusion, SimplifiedFieldTypeClassification
    from vibertgrid_tpu.ops import roi_align
    from vibertgrid_tpu.ops.pallas_scatter import bertgrid_scatter_pallas

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    results = {}

    # ---- BERT encoder ----
    enc = TextEncoder(TextEncoderConfig.base("bert", 30522), DTYPE)
    ids = jnp.asarray(rng.integers(3, 30000, (B, 512)), jnp.int32)
    am = jnp.ones((B, 512), jnp.int32)
    ev = enc.init({"params": key, "dropout": key}, ids, am, deterministic=False)

    def bert_fwd(c, v):
        out = enc.apply(v, ids + (c > 1e30).astype(jnp.int32), am,
                        deterministic=False, rngs={"dropout": key})
        return jnp.mean(out.astype(jnp.float32))

    def bert_bwd(c, v):
        g = jax.grad(
            lambda p: jnp.mean(
                enc.apply(p, ids + (c > 1e30).astype(jnp.int32), am,
                          deterministic=False, rngs={"dropout": key}
                          ).astype(jnp.float32)))(v)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g, 0.0) * 1e-12 + c * 0.5

    results["bert fwd"] = timed(loop(bert_fwd), ev)
    results["bert fwd+bwd"] = timed(loop(bert_bwd), ev)

    # ---- ResNet-34 FPN (with early-fusion grid input) ----
    bk = ResNetFPN(dtype=DTYPE, **BACKBONE_REGISTRY["resnet_34_fpn"])
    img = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
    grid = jnp.asarray(rng.standard_normal((B, H // 8, W // 8, 768)), DTYPE)
    bv = bk.init(key, img, grid, False)

    def bb_fwd(c, v):
        out = bk.apply(v, img + c * 1e-9, grid, False)
        return jnp.mean(out.astype(jnp.float32))

    def bb_bwd(c, v):
        g, _ = jax.grad(
            lambda p: jnp.mean(
                bk.apply({"params": p, "batch_stats": v["batch_stats"]},
                         img + c * 1e-9, grid, True,
                         mutable=["batch_stats"])[0].astype(jnp.float32)),
        )(v["params"]), None
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g, 0.0) * 1e-12 + c * 0.5

    results["resnet34-fpn fwd"] = timed(loop(bb_fwd), bv)
    results["resnet34-fpn fwd+bwd"] = timed(loop(bb_bwd), bv)

    # ---- BERTgrid scatter ----
    emb = jnp.asarray(rng.standard_normal((B, S, 768)), DTYPE)
    boxes = jnp.asarray(rng.integers(0, 300, (B, S, 4)), jnp.int32)
    boxes = boxes.at[:, :, 2:].set(boxes[:, :, :2] + 24)
    bm = jnp.ones((B, S), bool)

    def scat(e):
        return jax.vmap(
            lambda ee, bb, mm: bertgrid_scatter_pallas(
                ee, bb, mm, height=H // 8, width=W // 8, stride=8)
        )(e, boxes, bm)

    def scat_fwd(c, e):
        return jnp.mean(scat(e + c.astype(DTYPE) * 0).astype(jnp.float32)) + c * 0.5

    def scat_bwd(c, e):
        g = jax.grad(lambda x: jnp.mean(scat(x).astype(jnp.float32)))(
            e + c.astype(DTYPE) * 0)
        return jnp.sum(g.astype(jnp.float32)) * 1e-9 + c * 0.5

    results["scatter fwd"] = timed(loop(scat_fwd), emb)
    results["scatter fwd+bwd"] = timed(loop(scat_bwd), emb)

    # ---- seg head (losses incl. rasterization) ----
    sh = SimplifiedSemanticSegmentationHead(
        num_classes=5, loss_1_sample_list=[64, 128, 64],
        num_hard_positive=512, num_hard_negative=512, dtype=DTYPE)
    pf = jnp.asarray(rng.standard_normal((B, H // 4, W // 4, 256)), DTYPE)
    segc = jnp.asarray(rng.integers(0, 5, (B, S)), jnp.int32)
    sv = sh.init(key, pf, segc, boxes, bm, train=False, key=key)

    def seg_fwd(c, v):
        loss, _, _ = sh.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            pf + c.astype(DTYPE) * 0, segc, boxes, bm, train=True, key=key,
            mutable=["batch_stats"])[0]
        return loss.astype(jnp.float32) + c * 0.5

    def seg_bwd(c, v):
        g = jax.grad(
            lambda x: sh.apply(
                {"params": v["params"], "batch_stats": v["batch_stats"]},
                x, segc, boxes, bm, train=True, key=key,
                mutable=["batch_stats"])[0][0])(pf + c.astype(DTYPE) * 0)
        return jnp.sum(g.astype(jnp.float32)) * 1e-9 + c * 0.5

    results["seg-head loss fwd"] = timed(loop(seg_fwd), sv)
    results["seg-head loss fwd+bwd"] = timed(loop(seg_bwd), sv)

    # ---- RoIAlign + late fusion + field head ----
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
                 segc.reshape(-1), vmask, train=False, compute_loss=True, key=key)

    def head_path(p, x):
        r = roi_align(x, boxes.astype(jnp.float32), bm, output_size=7,
                      spatial_scale=0.25)
        f, _ = lf.apply(p["lf"], r.reshape(B * S, 7, 7, -1), semb, vmask,
                        True, rngs={"dropout": key}, mutable=["batch_stats"])
        loss, _, _ = fh.apply(p["fh"], f, segc.reshape(-1), vmask, train=True,
                              compute_loss=True, key=key, rngs={"dropout": key})
        return loss.astype(jnp.float32)

    pp = {"lf": lv, "fh": fv}

    def head_fwd(c, p):
        return head_path(p, pf + c.astype(DTYPE) * 0) + c * 0.5

    def head_bwd(c, p):
        g = jax.grad(lambda x: head_path(p, x))(pf + c.astype(DTYPE) * 0)
        return jnp.sum(g.astype(jnp.float32)) * 1e-9 + c * 0.5

    results["roi+fuse+head fwd"] = timed(loop(head_fwd), pp)
    results["roi+fuse+head fwd+bwd"] = timed(loop(head_bwd), pp)

    for k, v in results.items():
        print(f"{k:26s} {v:8.2f} ms/batch")


if __name__ == "__main__":
    main()
