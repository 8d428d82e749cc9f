"""Pallas TPU kernel: fused BERTgrid scatter.

The north-star kernel (BASELINE.json / SURVEY.md §2.9 item 4): paint each
text segment's embedding over its box on the stride-8 grid with
later-box-wins semantics, replacing the reference's per-segment Python loop
(``model/BERTgrid_generator.py:230-243``).

Design: the output grid is tiled over rows (grid = row-tiles), with all
positions kept in flattened ``(row·width + col)`` space — Mosaic's layout
inference rejects 2-D↔1-D shape casts inside kernels. Phase 1 computes the
tile's winner map fully vectorised on the VPU: ``inside[n, S]`` from four
broadcast comparisons, then later-wins = max over covering segment indices.
Phase 2 writes the output as a one-hot × embeddings matmul on the MXU:

    out[pos, :] = onehot(winner[pos], S+1) @ concat([0; emb])

which turns the data-dependent gather into an MXU contraction — the same
dense-weights trick as ops/roi_align.py, profitable because S ≤ 512.

A custom VJP makes the op differentiable w.r.t. the embeddings: the
backward kernel rebuilds each tile's one-hot winner matrix and accumulates
``onehotᵀ · d_out`` into the [S+1, D] cotangent across the sequential TPU
grid. The model uses this kernel on TPU (measured ~25% faster than the XLA
winner-map path in ops/rasterize.py, which remains the CPU fallback and the
test oracle). ``interpret=True`` runs anywhere.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(boxes_ref, mask_ref, emb_ref, out_ref, *, tile_h, width):
    """One row-tile: vectorised winner map, then one-hot matmul on the MXU.

    boxes_ref: [4, S] VMEM (x0/y0/x1/y1 rows, already grid-scaled);
    mask_ref: [1, S] VMEM int32; emb_ref: [S+1, D] VMEM (row 0 = zeros);
    out_ref: [tile_h·width, D].
    """
    onehot = _winner_onehot(
        boxes_ref, mask_ref, pl.program_id(0), tile_h, width, emb_ref.dtype
    )
    out_ref[:] = jnp.dot(
        onehot, emb_ref[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _winner_onehot(boxes_ref, mask_ref, tile, tile_h, width, out_dtype):
    """Shared phase-1: the tile's [n, S+1] one-hot winner matrix."""
    row0 = tile * tile_h
    n = tile_h * width
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    rows = idx // width + row0
    cols = idx % width
    x0 = boxes_ref[0][None, :]  # [1, S]
    y0 = boxes_ref[1][None, :]
    x1 = boxes_ref[2][None, :]
    y1 = boxes_ref[3][None, :]
    valid = mask_ref[0][None, :] != 0
    inside = (rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1) & valid
    s = inside.shape[1]
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1) + 1
    winner = jnp.max(jnp.where(inside, seg_ids, 0), axis=1, keepdims=True)
    return (
        winner == jax.lax.broadcasted_iota(jnp.int32, (1, s + 1), 1)
    ).astype(out_dtype)


def _bwd_kernel(boxes_ref, mask_ref, dout_ref, demb_ref, *, tile_h, width):
    """d_emb[s] = Σ over cells the segment won of d_out[cell].

    TPU grid steps run sequentially, so the [S+1, D] output block (same for
    every program) is accumulated across row-tiles: zero it on the first
    tile, then add each tile's onehotᵀ · d_out contraction.
    """
    tile = pl.program_id(0)
    onehot = _winner_onehot(
        boxes_ref, mask_ref, tile, tile_h, width, dout_ref.dtype
    )

    @pl.when(tile == 0)
    def _():
        demb_ref[:] = jnp.zeros_like(demb_ref)

    demb_ref[:] += jax.lax.dot_general(
        onehot,
        dout_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(demb_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def _scatter_core(
    embeddings, boxes, box_mask, height, width, stride, tile_h, interpret
):
    out, _ = _scatter_fwd(
        embeddings, boxes, box_mask, height, width, stride, tile_h, interpret
    )
    return out


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
    embeddings [S, D], boxes [S, 4] int, mask [S] → [height, width, D].
    Differentiable w.r.t. ``embeddings`` (fused transposed-gather backward)."""
    return _scatter_core(
        embeddings, boxes, box_mask, height, width, stride, tile_h, interpret
    )


def _scatter_prep(embeddings, boxes, box_mask, stride):
    emb0 = jnp.concatenate(
        [jnp.zeros((1, embeddings.shape[1]), embeddings.dtype), embeddings],
        axis=0,
    )
    boxes_t = (boxes.astype(jnp.int32) // stride).T  # [4, S] grid cells
    mask2d = box_mask.astype(jnp.int32)[None, :]  # [1, S]
    return emb0, boxes_t, mask2d


def _scatter_fwd(
    embeddings, boxes, box_mask, height, width, stride, tile_h, interpret
):
    s, d = embeddings.shape
    # largest row-tile dividing the grid height (images are padded /32, so
    # height is always /4 and tile_h*width stays sublane-aligned)
    tile_h = math.gcd(min(tile_h, height), height)
    emb0, boxes_t, mask2d = _scatter_prep(embeddings, boxes, box_mask, stride)
    out = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, width=width),
        grid=(height // tile_h,),
        in_specs=[
            pl.BlockSpec((4, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s + 1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_h * width, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((height * width, d), embeddings.dtype),
        interpret=interpret,
    )(boxes_t, mask2d, emb0)
    return out.reshape(height, width, d), (embeddings, boxes, box_mask)


def _scatter_bwd(height, width, stride, tile_h, interpret, residuals, g):
    import numpy as np

    embeddings, boxes, box_mask = residuals
    s, d = embeddings.shape
    tile_h = math.gcd(min(tile_h, height), height)
    _, boxes_t, mask2d = _scatter_prep(embeddings, boxes, box_mask, stride)
    demb0 = pl.pallas_call(
        functools.partial(_bwd_kernel, tile_h=tile_h, width=width),
        grid=(height // tile_h,),
        in_specs=[
            pl.BlockSpec((4, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_h * width, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (s + 1, d), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        # accumulate across row-tiles in fp32 (bf16 += would round each
        # tile's contribution to 8 mantissa bits), cast once at the end
        out_shape=jax.ShapeDtypeStruct((s + 1, d), jnp.float32),
        interpret=interpret,
    )(boxes_t, mask2d, g.reshape(height * width, d))
    zero_int = lambda x: np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)
    return demb0[1:].astype(embeddings.dtype), zero_int(boxes), zero_int(box_mask)


_scatter_core.defvjp(_scatter_fwd, _scatter_bwd)
