"""Pallas kernels vs XLA oracles (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from vibertgrid_tpu.ops.pallas_scatter import bertgrid_scatter_pallas
from tests.oracles import scatter_np

RNG = np.random.default_rng(7)


def test_pallas_scatter_matches_oracle():
    h, w, s, d = 32, 32, 19, 16
    stride = 8
    x0 = RNG.integers(0, w * stride - 16, s)
    y0 = RNG.integers(0, h * stride - 16, s)
    boxes = np.stack(
        [x0, y0, x0 + RNG.integers(8, 64, s), y0 + RNG.integers(8, 32, s)], 1
    ).astype(np.int32)
    mask = RNG.random(s) > 0.2
    emb = RNG.standard_normal((s, d)).astype(np.float32)
    got = np.asarray(
        bertgrid_scatter_pallas(
            jnp.asarray(emb),
            jnp.asarray(boxes),
            jnp.asarray(mask),
            height=h,
            width=w,
            stride=stride,
            tile_h=8,
            interpret=True,
        )
    )
    want = scatter_np(emb, boxes, mask, h, w, stride)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pallas_scatter_overlap_later_wins():
    boxes = np.array([[0, 0, 64, 64], [32, 32, 96, 96]], np.int32)
    mask = np.ones(2, bool)
    emb = np.array([[1.0] * 8, [2.0] * 8], np.float32)
    got = np.asarray(
        bertgrid_scatter_pallas(
            jnp.asarray(emb), jnp.asarray(boxes), jnp.asarray(mask),
            height=16, width=16, stride=8, tile_h=8, interpret=True,
        )
    )
    assert got[5, 5, 0] == 2.0  # overlap region → later box
    assert got[1, 1, 0] == 1.0
    assert got[14, 14, 0] == 0.0
