"""Host-side image transform: normalize, resize, bucket-pad.

The reference runs this in-graph per batch (Faster-R-CNN style,
``/root/reference/pipeline/transform.py``): normalize, resize so the short
edge hits a (random at train time) min size capped by a max size, rescale
boxes, zero-pad the batch to its max shape rounded up to /32. On TPU every
padded shape is a compile signature, so the resize runs on host and padding
targets a small static set of *buckets* (multiples of ``bucket_multiple``),
making jit signatures reusable across batches (SURVEY.md §7 step 4).

Numerics: :func:`bilinear_resize` reproduces ``F.interpolate(...,
mode='bilinear', align_corners=False)`` exactly (half-pixel source grid, edge
clamp) rather than PIL's antialiased resize, since training and eval both saw
torch semantics in the reference. Output sizes follow torch's
``recompute_scale_factor=True`` (floor of shape × scale).

Deliberate divergence: the reference rescales x-coordinates by the *height*
ratio and y by the *width* ratio (``pipeline/transform.py:167-168`` — an axis
swap). Aspect ratio is preserved so the ratios differ only by rounding, but
we use the correct axes; training and eval share this transform, so F1
comparisons are internally consistent.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import numpy as np


def bilinear_resize(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """torch-semantics (align_corners=False) bilinear resize. image [H,W,C]."""
    h, w = image.shape[:2]
    if (h, w) == (out_h, out_w):
        return image.astype(np.float32)

    def axis_coords(out_n, in_n):
        src = (np.arange(out_n, dtype=np.float64) + 0.5) * (in_n / out_n) - 0.5
        src = np.clip(src, 0.0, in_n - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, in_n - 1)
        frac = (src - lo).astype(np.float32)
        return lo, hi, frac

    ylo, yhi, fy = axis_coords(out_h, h)
    xlo, xhi, fx = axis_coords(out_w, w)
    img = image.astype(np.float32)
    top = img[ylo][:, xlo] * (1 - fx)[None, :, None] + img[ylo][:, xhi] * fx[None, :, None]
    bot = img[yhi][:, xlo] * (1 - fx)[None, :, None] + img[yhi][:, xhi] * fx[None, :, None]
    return top * (1 - fy)[:, None, None] + bot * fy[:, None, None]


@dataclasses.dataclass
class ImageTransform:
    """Resize + normalize + box rescale (host side)."""

    image_mean: Sequence[float]
    image_std: Sequence[float]
    train_min_size: Sequence[int]  # paper: [320, 416, 512, 608, 704]
    test_min_size: int = 512
    max_size: int = 800

    def __call__(
        self,
        image: np.ndarray,
        boxes: np.ndarray,
        train: bool,
        rng: np.random.Generator | None = None,
    ) -> tuple[np.ndarray, np.ndarray, tuple[int, int]]:
        """image [H,W,3] float32 in [0,1]; boxes [S,4] int. Returns
        (resized+normalized image, rescaled int boxes, (h, w))."""
        h, w = image.shape[:2]
        min_size = self.draw_min_size(rng) if train else float(self.test_min_size)
        out_h, out_w = self._output_shape(h, w, min_size)

        from vibertgrid_tpu.data import native

        resized = native.bilinear_resize_norm(
            image, out_h, out_w,
            np.asarray(self.image_mean, np.float32),
            np.asarray(self.image_std, np.float32),
        )
        return resized, self.rescale_boxes(boxes, (h, w), (out_h, out_w)), (
            out_h,
            out_w,
        )

    def draw_min_size(self, rng: np.random.Generator) -> float:
        """One per-image random short-edge target (the reference draws per
        image too, ``pipeline/transform.py:192-196``)."""
        assert rng is not None
        return float(rng.choice(list(self.train_min_size)))

    @staticmethod
    def rescale_boxes(
        boxes: np.ndarray, hw: tuple[int, int], ohw: tuple[int, int]
    ) -> np.ndarray:
        """Scale boxes from an (h, w) image onto its (oh, ow) resize.
        Correct-axis form of the reference's rescale (see module docstring
        on the deliberate axis-swap divergence)."""
        if not len(boxes):
            return np.zeros((0, 4), np.int32)
        (h, w), (out_h, out_w) = hw, ohw
        b = boxes.astype(np.float64).copy()
        b[:, [0, 2]] *= out_w / w
        b[:, [1, 3]] *= out_h / h
        return b.astype(np.int32)

    def _output_shape(self, h: int, w: int, min_size: float) -> tuple[int, int]:
        scale = min_size / min(h, w)
        if max(h, w) * scale > self.max_size:
            scale = self.max_size / max(h, w)
        return int(math.floor(h * scale)), int(math.floor(w * scale))

    def test_output_shape(self, h: int, w: int) -> tuple[int, int]:
        """Deterministic eval-time resize target (no image work) — used for
        bucket-signature grouping in the batched eval loader."""
        return self._output_shape(h, w, float(self.test_min_size))


def bucket_hw(h: int, w: int, multiple: int = 64) -> tuple[int, int]:
    """Round a resized shape up to the padding bucket."""
    up = lambda v: int(math.ceil(v / multiple) * multiple)
    return up(h), up(w)


def bucket_count(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n. Counts beyond the ladder's top round up to the
    next multiple of the top bucket (the ladder is open-ended, never a cap —
    the reference handles arbitrary segment/token counts,
    ``model/BERTgrid_generator.py:81-146``)."""
    for b in buckets:
        if n <= b:
            return b
    top = buckets[-1]
    return int(math.ceil(n / top) * top)
