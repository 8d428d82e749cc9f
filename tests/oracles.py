"""Pure-numpy oracles mirroring the reference implementation's semantics.

These are independent re-derivations (sequential loops, like the PyTorch
reference) used as golden references for the vectorized TPU ops:

- ``roi_align_np`` implements the published torchvision RoIAlign algorithm
  (aligned=False, adaptive sampling) sample-by-sample — the semantics of the
  C++ op instantiated at /root/reference/model/grid_roi_align.py:37-41.
- ``scatter_np`` mirrors the sequential overwrite loop of
  /root/reference/model/BERTgrid_generator.py:230-243.
- ``label_maps_np`` mirrors /root/reference/model/semantic_segmentation_head.py:199-214.
- ``aggregate_np`` mirrors the token loop of
  /root/reference/model/BERTgrid_generator.py:148-191.
"""

from __future__ import annotations

import math

import numpy as np


def bilinear_np(feat: np.ndarray, y: float, x: float) -> np.ndarray:
    """One bilinear tap with torchvision edge handling. feat: [H, W, C]."""
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1], feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(math.floor(y))
    x_low = int(math.floor(x))
    if y_low >= h - 1:
        y_low = y_high = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_low = x_high = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (
        hy * hx * feat[y_low, x_low]
        + hy * lx * feat[y_low, x_high]
        + ly * hx * feat[y_high, x_low]
        + ly * lx * feat[y_high, x_high]
    )


def roi_align_np(
    feat: np.ndarray,
    rois: np.ndarray,
    output_size: int = 7,
    spatial_scale: float = 0.25,
    sampling_ratio: int = -1,
) -> np.ndarray:
    """torchvision-semantics RoIAlign. feat [H, W, C], rois [R, 4] → [R,P,P,C]."""
    p = output_size
    out = np.zeros((len(rois), p, p, feat.shape[-1]), np.float64)
    for r, (x0, y0, x1, y1) in enumerate(rois.astype(np.float64)):
        sx0, sy0, sx1, sy1 = (
            x0 * spatial_scale,
            y0 * spatial_scale,
            x1 * spatial_scale,
            y1 * spatial_scale,
        )
        roi_w = max(sx1 - sx0, 1.0)
        roi_h = max(sy1 - sy0, 1.0)
        bin_w = roi_w / p
        bin_h = roi_h / p
        gh = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_h / p))
        gw = sampling_ratio if sampling_ratio > 0 else int(math.ceil(roi_w / p))
        gh, gw = max(gh, 1), max(gw, 1)
        count = gh * gw
        for ph in range(p):
            for pw in range(p):
                acc = np.zeros(feat.shape[-1], np.float64)
                for iy in range(gh):
                    y = sy0 + ph * bin_h + (iy + 0.5) * bin_h / gh
                    for ix in range(gw):
                        x = sx0 + pw * bin_w + (ix + 0.5) * bin_w / gw
                        acc += bilinear_np(feat, y, x)
                out[r, ph, pw] = acc / count
    return out


def scatter_np(
    emb: np.ndarray, boxes: np.ndarray, mask: np.ndarray, h: int, w: int, stride: int
) -> np.ndarray:
    """Sequential later-wins scatter. emb [S,D] → grid [h, w, D]."""
    grid = np.zeros((h, w, emb.shape[-1]), emb.dtype)
    for s in range(len(boxes)):
        if not mask[s]:
            continue
        x0, y0, x1, y1 = (int(v) // stride for v in boxes[s])
        grid[y0:y1, x0:x1] = emb[s]
    return grid


def label_maps_np(
    classes: np.ndarray, boxes: np.ndarray, mask: np.ndarray, h: int, w: int
) -> tuple[np.ndarray, np.ndarray]:
    pos_neg = np.zeros((h, w), np.int32)
    cls = np.zeros((h, w), np.int32)
    for s in range(len(boxes)):
        if not mask[s]:
            continue
        x0, y0, x1, y1 = (int(v) for v in boxes[s])
        pos_neg[y0:y1, x0:x1] = 1 if classes[s] > 0 else 2
        cls[y0:y1, x0:x1] = classes[s]
    return pos_neg, cls


def aggregate_np(
    tok: np.ndarray, seg_ids: np.ndarray, mask: np.ndarray, s: int, mode: str
) -> np.ndarray:
    out = np.zeros((s, tok.shape[-1]), tok.dtype)
    for seg in range(s):
        sel = (seg_ids == seg) & mask.astype(bool)
        if not sel.any():
            continue
        if mode == "mean":
            out[seg] = tok[sel].mean(axis=0)
        else:
            out[seg] = tok[sel][0]
    return out
