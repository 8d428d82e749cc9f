"""RoIAlign with torchvision semantics, as two dense MXU contractions.

The reference delegates to ``torchvision.ops.RoIAlign(output_size=7,
spatial_scale=1/4, sampling_ratio=-1)`` — a C++/CUDA op
(``/root/reference/model/grid_roi_align.py:37-41``). SURVEY.md §2.9 flags its
bit-parity as the F1-risk point, so this implementation reproduces the
published torchvision algorithm exactly (aligned=False):

- ``roi_{w,h} = max(coord_hi*scale - coord_lo*scale, 1)``
- adaptive sampling grid ``grid = ceil(roi / pooled)`` per bin
- samples at ``start + p*bin + (i+0.5)*bin/grid``
- bilinear taps, samples outside ``[-1, size]`` dropped (contribute 0 but
  still divide the count), coordinates clamped at 0, degenerate handling at
  the high edge.

TPU-native design: bilinear sampling + in-bin averaging is a *separable
linear operator*, so each RoI's pooled output is ``Wy · F · Wxᵀ`` where
``Wy [P, Hf]`` / ``Wx [P, Wf]`` hold the summed tap weights of every sample.
Feature maps are small (stride-4 of ≤832px → ≤208), so the row/col weight
matrices are built *dense* (static shapes, pure VPU comparisons against an
iota) and both contractions become large batched matmuls:

    stage 1: [S·P, Hf] @ [Hf, Wf·C]      (one GEMM per image)
    stage 2: einsum('sqw,spwc->spqc')     (batched small GEMMs)

This is exact — dense weights beat gather-based formulations on TPU because
they turn data-dependent addressing into MXU work and stream the feature map
from HBM once per image instead of once per (roi, bin) window. The only
static cap is the adaptive sample count (``max_grid_h/w``); results are
bit-identical to torchvision whenever the adaptive count fits the cap (always
true for document text segments at the defaults).

The data-dependent (per-RoI) sampling grid is masked, never materialized as a
shape; padding RoIs produce zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _dense_axis_weights(starts, bins, grids, grid_cap, size):
    """Dense 1-D pooling weights ``[S, P, size]``.

    starts/bins: ``[S, P]`` / ``[S]`` roi bin geometry in feature px.
    grids: ``[S]`` int effective samples per bin (clamped to grid_cap).
    """
    s, p = starts.shape
    i = jnp.arange(grid_cap, dtype=jnp.float32)  # sample index in bin
    sample_valid = i[None, :] < grids[:, None].astype(jnp.float32)  # [S, G]
    # torchvision: coord = start + (i + .5) * bin / grid
    coord = (
        starts[:, :, None]
        + (i[None, None, :] + 0.5)
        * bins[:, None, None]
        / jnp.maximum(grids[:, None, None], 1)
    )  # [S, P, G]
    in_range = (coord >= -1.0) & (coord <= size)
    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c).astype(jnp.int32)
    degen = low >= size - 1
    low = jnp.where(degen, size - 1, low)
    frac = jnp.where(degen, 0.0, c - low.astype(jnp.float32))
    high = jnp.minimum(low + 1, size - 1)

    keep = (sample_valid[:, None, :] & in_range).astype(jnp.float32)
    w_low = (1.0 - frac) * keep   # [S, P, G]
    w_high = frac * keep

    axis = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)  # [1,1,size]
    w = jnp.zeros((s, p, size), jnp.float32)
    for g in range(grid_cap):  # static unroll; G adds of [S, P, size]
        w = w + jnp.where(axis == low[:, :, g : g + 1], w_low[:, :, g : g + 1], 0.0)
        w = w + jnp.where(axis == high[:, :, g : g + 1], w_high[:, :, g : g + 1], 0.0)
    return w


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size",
        "spatial_scale",
        "sampling_ratio",
        "max_grid_h",
        "max_grid_w",
    ),
)
def roi_align(
    features: jax.Array,
    rois: jax.Array,
    roi_mask: jax.Array,
    *,
    output_size: int = 7,
    spatial_scale: float = 0.25,
    sampling_ratio: int = -1,
    max_grid_h: int = 8,
    max_grid_w: int = 16,
) -> jax.Array:
    """Apply RoIAlign to a batch of feature maps.

    Args:
        features: ``[B, Hf, Wf, C]`` feature maps (NHWC).
        rois: ``[B, S, 4]`` boxes ``(x0, y0, x1, y1)`` in image pixels.
        roi_mask: ``[B, S]`` bool; padding RoIs produce zeros.
        output_size: pooled output edge (reference uses 7).
        spatial_scale: image→feature coordinate scale (reference 1/4).
        sampling_ratio: fixed samples per bin if > 0, else adaptive
            ``ceil(roi/pooled)`` clamped to the static caps.

    Returns:
        ``[B, S, output_size, output_size, C]`` pooled features (f32).
    """
    b, hf, wf, c = features.shape
    s = rois.shape[1]
    p = output_size

    def weights_for_image(img_rois, img_mask):
        box = img_rois.astype(jnp.float32) * spatial_scale  # [S, 4]
        x0, y0, x1, y1 = box[:, 0], box[:, 1], box[:, 2], box[:, 3]
        roi_w = jnp.maximum(x1 - x0, 1.0)
        roi_h = jnp.maximum(y1 - y0, 1.0)
        bin_w = roi_w / p
        bin_h = roi_h / p
        if sampling_ratio > 0:
            gh = jnp.full((s,), min(sampling_ratio, max_grid_h), jnp.int32)
            gw = jnp.full((s,), min(sampling_ratio, max_grid_w), jnp.int32)
        else:
            gh = jnp.clip(jnp.ceil(bin_h).astype(jnp.int32), 1, max_grid_h)
            gw = jnp.clip(jnp.ceil(bin_w).astype(jnp.int32), 1, max_grid_w)
        count = (gh * gw).astype(jnp.float32)  # [S]

        pr = jnp.arange(p, dtype=jnp.float32)
        y_starts = y0[:, None] + pr[None, :] * bin_h[:, None]  # [S, P]
        x_starts = x0[:, None] + pr[None, :] * bin_w[:, None]

        wy = _dense_axis_weights(y_starts, bin_h, gh, max_grid_h, hf)  # [S,P,Hf]
        wx = _dense_axis_weights(x_starts, bin_w, gw, max_grid_w, wf)  # [S,P,Wf]
        # fold the 1/count and the mask into wy once
        scale_r = jnp.where(img_mask, 1.0 / count, 0.0)
        wy = wy * scale_r[:, None, None]
        return wy, wx

    wy, wx = jax.vmap(weights_for_image)(rois, roi_mask)  # [B,S,P,Hf], [B,S,P,Wf]

    # Match the weight dtype to the features: with bf16 feature maps the two
    # contractions hit the native bf16×bf16→fp32 MXU path (~12× faster than
    # fp32 on v5e); with fp32 features the op stays bit-exact vs torchvision
    # (the parity mode used by the golden tests and fp32 models).
    wy = wy.astype(features.dtype)
    wx = wx.astype(features.dtype)

    # stage 1: rows. [B, S·P, Hf] @ [B, Hf, Wf·C] → [B, S, P, Wf, C]
    fy = jnp.einsum(
        "bsph,bhwc->bspwc", wy, features, preferred_element_type=jnp.float32
    )
    # stage 2: cols. [B,S,Q,Wf] × [B,S,P,Wf,C] → [B,S,P,Q,C]
    out = jnp.einsum(
        "bsqw,bspwc->bspqc", wx, fy.astype(features.dtype),
        preferred_element_type=jnp.float32,
    )
    return out
