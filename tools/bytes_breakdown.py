"""Per-component XLA cost analysis (FLOPs + HBM bytes) at bench shapes.

The full train step accesses ~47 GB at 59.3 ms — 794 GB/s, the v5e HBM
roofline — so optimization now means reducing bytes. This localizes them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, T, S = 8, 512, 384, 510, 128
DTYPE = jnp.bfloat16


def report(name, fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    fl = ca.get("flops", 0)
    by = ca.get("bytes accessed", 0)
    print(f"{name:28s} {fl / 1e9:8.1f} GFLOP  {by / 1e9:7.2f} GB "
          f" (ideal {by / 810e9 * 1e3:5.2f} ms @HBM, {fl / 167e12 * 1e3:5.2f} ms @MXU)")


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from vibertgrid_tpu.models.bert import TextEncoder, TextEncoderConfig
    from vibertgrid_tpu.models.resnet_fpn import BACKBONE_REGISTRY, ResNetFPN
    from vibertgrid_tpu.models.seg_head import SimplifiedSemanticSegmentationHead

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    enc = TextEncoder(TextEncoderConfig.base("bert", 30522), DTYPE)
    ids = jnp.asarray(rng.integers(3, 30000, (B, 512)), jnp.int32)
    am = jnp.ones((B, 512), jnp.int32)
    ev = enc.init({"params": key, "dropout": key}, ids, am, deterministic=False)

    def bert_bwd(v):
        g = jax.grad(
            lambda p: jnp.mean(
                enc.apply(p, ids, am, deterministic=False,
                          rngs={"dropout": key}).astype(jnp.float32)))(v)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g, 0.0)

    report("bert fwd+bwd", bert_bwd, ev)

    bk = ResNetFPN(dtype=DTYPE, **BACKBONE_REGISTRY["resnet_34_fpn"])
    img = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
    grid = jnp.asarray(rng.standard_normal((B, H // 8, W // 8, 768)), DTYPE)
    bv = bk.init(key, img, grid, False)

    def bb_bwd(p):
        g = jax.grad(
            lambda pp: jnp.mean(
                bk.apply({"params": pp, "batch_stats": bv["batch_stats"]},
                         img, grid, True,
                         mutable=["batch_stats"])[0].astype(jnp.float32)))(p)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g, 0.0)

    report("resnet34-fpn fwd+bwd", bb_bwd, bv["params"])

    sh = SimplifiedSemanticSegmentationHead(
        num_classes=5, loss_1_sample_list=[64, 128, 64],
        num_hard_positive=512, num_hard_negative=512, dtype=DTYPE)
    pf = jnp.asarray(rng.standard_normal((B, H // 4, W // 4, 256)), DTYPE)
    boxes = jnp.asarray(rng.integers(0, 300, (B, S, 4)), jnp.int32)
    boxes = boxes.at[:, :, 2:].set(boxes[:, :, :2] + 24)
    bm = jnp.ones((B, S), bool)
    segc = jnp.asarray(rng.integers(0, 5, (B, S)), jnp.int32)
    sv = sh.init(key, pf, segc, boxes, bm, train=False, key=key)

    def seg_bwd(x):
        g = jax.grad(
            lambda xx: sh.apply(
                {"params": sv["params"], "batch_stats": sv["batch_stats"]},
                xx, segc, boxes, bm, train=True, key=key,
                mutable=["batch_stats"])[0][0])(x)
        return jnp.sum(g.astype(jnp.float32))

    report("seg-head loss fwd+bwd", seg_bwd, pf)


if __name__ == "__main__":
    main()
