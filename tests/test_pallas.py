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


def test_pallas_scatter_vmap_grad_matches_xla():
    """Batched (vmap) kernel + custom transposed-gather VJP vs the XLA path."""
    import jax
    import jax.numpy as jnp
    from vibertgrid_tpu.ops.rasterize import bertgrid_scatter

    b, s, d, hh, ww = 3, 19, 16, 32, 24
    emb = jnp.asarray(RNG.standard_normal((b, s, d)), jnp.float32)
    x0 = RNG.integers(0, 150, (b, s))
    y0 = RNG.integers(0, 200, (b, s))
    boxes = jnp.asarray(np.stack([x0, y0, x0 + 40, y0 + 24], -1), jnp.int32)
    mask = jnp.asarray(RNG.random((b, s)) > 0.2)

    f_p = jax.vmap(
        lambda e, bx, m: bertgrid_scatter_pallas(
            e, bx, m, height=hh, width=ww, stride=8, tile_h=8, interpret=True
        )
    )
    f_x = jax.vmap(
        lambda e, bx, m: bertgrid_scatter(e, bx, m, height=hh, width=ww, stride=8)
    )
    np.testing.assert_allclose(
        np.asarray(f_p(emb, boxes, mask)), np.asarray(f_x(emb, boxes, mask)),
        rtol=1e-6,
    )
    w = jnp.asarray(RNG.standard_normal((b, hh, ww, d)), jnp.float32)
    gp = jax.grad(lambda e: jnp.sum(f_p(e, boxes, mask) * w))(emb)
    gx = jax.grad(lambda e: jnp.sum(f_x(e, boxes, mask) * w))(emb)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=2e-6)


def test_pallas_scatter_non_tile_aligned_height():
    """Grid heights not divisible by the default row tile (e.g. small
    synthetic images → height 28) must still work via gcd tiling."""
    import jax.numpy as jnp
    from vibertgrid_tpu.ops.rasterize import bertgrid_scatter

    h, w, s, d = 28, 36, 9, 8
    x0 = RNG.integers(0, w * 8 - 16, s)
    y0 = RNG.integers(0, h * 8 - 16, s)
    boxes = np.stack([x0, y0, x0 + 12, y0 + 10], 1).astype(np.int32)
    mask = np.ones(s, bool)
    emb = RNG.standard_normal((s, d)).astype(np.float32)
    got = bertgrid_scatter_pallas(
        jnp.asarray(emb), jnp.asarray(boxes), jnp.asarray(mask),
        height=h, width=w, stride=8, interpret=True,
    )
    want = bertgrid_scatter(
        jnp.asarray(emb), jnp.asarray(boxes), jnp.asarray(mask),
        height=h, width=w, stride=8,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
