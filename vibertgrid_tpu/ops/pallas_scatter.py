"""Pallas TPU kernel: fused BERTgrid scatter.

The north-star kernel (BASELINE.json / SURVEY.md §2.9 item 4): paint each
text segment's embedding over its box on the stride-8 grid with
later-box-wins semantics, replacing the reference's per-segment Python loop
(``model/BERTgrid_generator.py:230-243``).

Design: the output grid is tiled over rows (grid = row-tiles); box
coordinates arrive as scalar-prefetch arguments (SMEM) so each program can
loop over segments with cheap scalar reads. Phase 1 computes the tile's
winner map (later-wins = max over covering segment indices, vectorized per
segment on the VPU); phase 2 writes the output as a one-hot × embeddings
matmul on the MXU:

    out[y, x, :] = onehot(winner[y, x], S+1) @ concat([0; emb])

which turns the data-dependent gather into an MXU contraction — the same
dense-weights trick as ops/roi_align.py, profitable because S ≤ 512.

The XLA path (ops/rasterize.py) remains the default on CPU and the oracle in
tests; ``bertgrid_scatter_pallas(..., interpret=True)`` runs anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(boxes_ref, mask_ref, emb_ref, out_ref, *, tile_h, width, stride, seg_cap):
    """One row-tile: winner map then one-hot matmul.

    boxes_ref/mask_ref: scalar-prefetch SMEM ([S*4] int32, [S] int32).
    emb_ref: [S+1, D] VMEM (row 0 = zeros). out_ref: [tile_h, width, D].
    """
    tile = pl.program_id(0)
    row0 = tile * tile_h
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_h, width), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_h, width), 1)

    def body(s, winner):
        x0 = boxes_ref[4 * s] // stride
        y0 = boxes_ref[4 * s + 1] // stride
        x1 = boxes_ref[4 * s + 2] // stride
        y1 = boxes_ref[4 * s + 3] // stride
        valid = mask_ref[s] != 0
        inside = (
            (rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1) & valid
        )
        return jnp.where(inside, s + 1, winner)

    winner = jax.lax.fori_loop(0, seg_cap, body, jnp.zeros((tile_h, width), jnp.int32))

    # one-hot [tile_h*width, S+1] @ emb [S+1, D] on the MXU
    flat = winner.reshape(tile_h * width)
    onehot = (
        flat[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, seg_cap + 1), 1)
    ).astype(emb_ref.dtype)
    out = jnp.dot(onehot, emb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = out.reshape(tile_h, width, -1).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "stride", "tile_h", "interpret"),
)
def bertgrid_scatter_pallas(
    embeddings: jax.Array,
    boxes: jax.Array,
    box_mask: jax.Array,
    *,
    height: int,
    width: int,
    stride: int = 8,
    tile_h: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Pallas BERTgrid scatter. Same contract as ops.rasterize.bertgrid_scatter:
    embeddings [S, D], boxes [S, 4] int, mask [S] → [height, width, D]."""
    s, d = embeddings.shape
    tile_h = min(tile_h, height)
    assert height % tile_h == 0, (height, tile_h)
    emb0 = jnp.concatenate(
        [jnp.zeros((1, d), embeddings.dtype), embeddings], axis=0
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(height // tile_h,),
        in_specs=[pl.BlockSpec((s + 1, d), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (tile_h, width, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _kernel, tile_h=tile_h, width=width, stride=stride, seg_cap=s
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((height, width, d), embeddings.dtype),
        interpret=interpret,
    )(
        boxes.astype(jnp.int32).reshape(-1),
        box_mask.astype(jnp.int32),
        emb0,
    )
