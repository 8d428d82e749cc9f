"""RoIAlign with torchvision semantics, as static-shape XLA.

The reference delegates to ``torchvision.ops.RoIAlign(output_size=7,
spatial_scale=1/4, sampling_ratio=-1)`` — a C++/CUDA op
(``/root/reference/model/grid_roi_align.py:37-41``). SURVEY.md §2.9 flags its
bit-parity as the F1-risk point, so this implementation reproduces the
published torchvision algorithm exactly (aligned=False):

- ``roi_{w,h} = max(coord_hi*scale - coord_lo*scale, 1)``
- adaptive sampling grid ``grid = ceil(roi / pooled)`` per bin
- samples at ``start + p*bin + (i+0.5)*bin/grid``
- bilinear taps, samples outside ``[-1, size]`` dropped (contribute 0 but
  still divide the count), coordinates clamped at 0, degenerate top row/col
  handling at the high edge.

TPU-native design: the adaptive (data-dependent) grid is bounded by static
caps ``max_grid_h/w`` and masked — results are bit-identical to torchvision
whenever the adaptive count fits the cap (always true for document text
segments at the defaults). Bilinear sampling + in-bin averaging is a
separable linear operator, so each RoI reduces to two small windowed
contractions against the feature map (rows then columns) instead of per-tap
gathers: MXU/VPU-friendly, no giant materialization. RoIs stream through
``lax.map`` in chunks to bound memory.

Feature maps are NHWC (channels-last = TPU lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_row_weights(starts, bins, grids, grid_cap, size, win, win_starts):
    """Per-bin 1-D sampling weights scattered into a static window.

    Args:
        starts: ``[P]`` roi start coordinate (feature px) per output bin.
        bins: scalar bin size (feature px).
        grids: scalar int effective sample count per bin (clamped).
        grid_cap: static max sample count.
        size: static extent of the feature map along this axis.
        win: static window length.
        win_starts: ``[P]`` int window start row/col per bin.

    Returns:
        ``[P, win]`` float32 summed bilinear tap weights.
    """
    p = starts.shape[0]
    i = jnp.arange(grid_cap, dtype=jnp.float32)  # sample index within bin
    sample_valid = i < grids  # [G]
    # Sample coordinate: start + (i + .5) * bin / grid  (torchvision formula).
    coord = starts[:, None] + (i[None, :] + 0.5) * bins / jnp.maximum(grids, 1)
    # Out-of-range samples are dropped entirely (but still counted).
    in_range = (coord >= -1.0) & (coord <= size)
    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c).astype(jnp.int32)
    # Degenerate high edge: low >= size-1 -> both taps at size-1, frac 0.
    degen = low >= size - 1
    low = jnp.where(degen, size - 1, low)
    frac = jnp.where(degen, 0.0, c - low.astype(jnp.float32))
    high = jnp.minimum(low + 1, size - 1)

    keep = (sample_valid[None, :] & in_range).astype(jnp.float32)  # [P, G]
    w_low = (1.0 - frac) * keep
    w_high = frac * keep

    # Scatter the two taps of every sample into the window via comparison.
    k = jnp.arange(win, dtype=jnp.int32)  # [win]
    rows = win_starts[:, None, None] + k[None, :, None]  # [P, win, 1]
    wmat = jnp.sum(
        jnp.where(rows == low[:, None, :], w_low[:, None, :], 0.0)
        + jnp.where(rows == high[:, None, :], w_high[:, None, :], 0.0),
        axis=-1,
    )  # [P, win]
    return wmat


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size",
        "spatial_scale",
        "sampling_ratio",
        "max_grid_h",
        "max_grid_w",
        "win_h",
        "win_w",
        "roi_chunk",
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
    win_h: int = 24,
    win_w: int = 40,
    roi_chunk: int = 8,
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
        max_grid_h / max_grid_w: static caps on the adaptive grid.
        win_h / win_w: static row/col window lengths; must cover
            ``bin + 2`` taps (``win >= max_grid`` derived span). Defaults
            cover text-segment geometry with wide margin.
        roi_chunk: RoIs processed per ``lax.map`` step.

    Returns:
        ``[B, S, output_size, output_size, C]`` pooled features.
    """
    b, hf, wf, c = features.shape
    s = rois.shape[1]
    p = output_size
    # Windows can never exceed the feature map itself (tiny-map test cases).
    win_h = min(win_h, hf)
    win_w = min(win_w, wf)
    pad = (-s) % roi_chunk
    rois = jnp.pad(rois.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    roi_mask = jnp.pad(roi_mask.astype(bool), ((0, 0), (0, pad)))
    s_pad = s + pad

    def one_image(feat, img_rois, img_mask):
        def one_chunk(args):
            crois, cmask = args  # [K,4], [K]

            def one_roi(box, valid):
                x0, y0, x1, y1 = box * spatial_scale
                roi_w = jnp.maximum(x1 - x0, 1.0)
                roi_h = jnp.maximum(y1 - y0, 1.0)
                bin_w = roi_w / p
                bin_h = roi_h / p
                if sampling_ratio > 0:
                    gh = jnp.full((), min(sampling_ratio, max_grid_h), jnp.int32)
                    gw = jnp.full((), min(sampling_ratio, max_grid_w), jnp.int32)
                else:
                    gh = jnp.clip(jnp.ceil(bin_h).astype(jnp.int32), 1, max_grid_h)
                    gw = jnp.clip(jnp.ceil(bin_w).astype(jnp.int32), 1, max_grid_w)
                count = (gh * gw).astype(jnp.float32)

                pr = jnp.arange(p, dtype=jnp.float32)
                y_starts = y0 + pr * bin_h  # [P]
                x_starts = x0 + pr * bin_w

                # Static windows positioned at each bin's first tap.
                ys_win = jnp.clip(
                    jnp.floor(jnp.maximum(y_starts, 0.0)).astype(jnp.int32),
                    0,
                    max(hf - win_h, 0),
                )
                xs_win = jnp.clip(
                    jnp.floor(jnp.maximum(x_starts, 0.0)).astype(jnp.int32),
                    0,
                    max(wf - win_w, 0),
                )

                wy = _bilinear_row_weights(
                    y_starts, bin_h, gh, max_grid_h, hf, win_h, ys_win
                )  # [P, win_h]
                wx = _bilinear_row_weights(
                    x_starts, bin_w, gw, max_grid_w, wf, win_w, xs_win
                )  # [P, win_w]

                # Row stage: gather each bin-row's window and contract.
                def row_slice(start):
                    return jax.lax.dynamic_slice(
                        feat, (start, 0, 0), (win_h, wf, c)
                    )

                fwin = jax.vmap(row_slice)(ys_win)  # [P, win_h, Wf, C]
                fy = jnp.einsum(
                    "pk,pkwc->pwc", wy, fwin, preferred_element_type=jnp.float32
                )  # [P, Wf, C]

                # Column stage.
                def col_slice(start):
                    return jax.lax.dynamic_slice(
                        fy, (0, start, 0), (p, win_w, c)
                    )

                fxwin = jax.vmap(col_slice)(xs_win)  # [Q, P, win_w, C]
                out = jnp.einsum(
                    "qk,qpkc->pqc", wx, fxwin, preferred_element_type=jnp.float32
                )  # [P, Q, C]
                out = out / count
                return jnp.where(valid, out, 0.0)

            return jax.vmap(one_roi)(crois, cmask)

        chunks = jax.lax.map(
            one_chunk,
            (
                img_rois.reshape(s_pad // roi_chunk, roi_chunk, 4),
                img_mask.reshape(s_pad // roi_chunk, roi_chunk),
            ),
        )
        return chunks.reshape(s_pad, p, p, c)

    out = jax.vmap(one_image)(features, rois, roi_mask)
    return out[:, :s]
