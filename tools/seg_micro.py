"""Micro-timing of the aux seg-head pieces at bench shapes (honest ITERS)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 100
B, H, W, S, C = 8, 512, 384, 128, 5


from tools._timing import make_timed

timed = make_timed(ITERS)


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from vibertgrid_tpu.ops.rasterize import rasterize_label_maps
    from vibertgrid_tpu.ops.losses import (
        _random_subsample_mask,
        cross_entropy_ohem_pooled,
        cross_entropy_random_sample_pooled,
    )

    rng = np.random.default_rng(0)
    boxes = rng.integers(0, 300, (B, S, 4)).astype(np.int32)
    boxes[:, :, 2:] = boxes[:, :, :2] + rng.integers(8, 40, (B, S, 2))
    boxes = jnp.asarray(boxes)
    bm = jnp.ones((B, S), bool)
    segc = jnp.asarray(rng.integers(0, C, (B, S)), jnp.int32)

    @jax.jit
    def raster_loop(boxes):
        def body(i, c):
            pn, cm = jax.vmap(
                lambda cc, bb, mm: rasterize_label_maps(
                    cc, bb, mm, height=H, width=W
                )
            )(segc, boxes + (c > 1e30).astype(jnp.int32), bm)
            return jnp.sum(cm).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    print(f"rasterize labels [8,512,384]  {timed(raster_loop, boxes):7.3f} ms")

    mask = jnp.asarray(rng.random((B * H * W,)) > 0.5)

    @jax.jit
    def sub_loop(mask):
        def body(i, c):
            kept = _random_subsample_mask(
                mask ^ (c > 1e30), 128, jax.random.PRNGKey(0)
            )
            return jnp.sum(kept).astype(jnp.float32) * 1e-6
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    print(f"random subsample 1.5M         {timed(sub_loop, mask):7.3f} ms")

    logits3 = jnp.asarray(rng.standard_normal((B, H // 4, W // 4, 3)), jnp.float32)
    logitsC = jnp.asarray(rng.standard_normal((B, H // 4, W // 4, C)), jnp.float32)
    pn = jnp.asarray(rng.integers(0, 3, (B, H, W)), jnp.int32)
    cm = jnp.asarray(rng.integers(0, C, (B, H, W)), jnp.int32)

    @jax.jit
    def loss_loop(logits3, logitsC):
        def body(i, c):
            l1 = cross_entropy_random_sample_pooled(
                logits3 + c * 1e-9, pn, block=4, sample_list=[64, 128, 64],
                key=jax.random.PRNGKey(0),
            )
            l2 = cross_entropy_ohem_pooled(
                logitsC + c * 1e-9, cm, block=4,
                num_hard_positive=512, num_hard_negative=512,
            )
            return (l1 + l2).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    print(f"pooled losses (l1+l2)         {timed(loss_loop, logits3, logitsC):7.3f} ms")


if __name__ == "__main__":
    main()
