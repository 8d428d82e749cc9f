"""ctypes bindings for the native host-ops library (csrc/host_ops.cpp).

The library is built lazily with g++ on first use and cached; every function
has a numpy fallback, so the pipeline works without a toolchain. Use
``native_available()`` to check, ``set_enabled(False)`` to force the numpy
path (tests compare both).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libhost_ops.so"))

_lib = None
# VIBERTGRID_NATIVE=0 forces the numpy fallbacks (debugging / bisection)
_enabled = os.environ.get("VIBERTGRID_NATIVE", "1") != "0"
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        def _build():
            subprocess.run(
                ["sh", os.path.abspath(os.path.join(_CSRC, "build.sh"))],
                check=True,
                capture_output=True,
            )

        # Staleness must be detected BEFORE the first dlopen: glibc dedupes
        # dlopen by pathname, so re-CDLL'ing a rebuilt .so at the same path
        # returns the stale in-process handle and a missing-symbol probe on
        # it would silently disable every native op for this process.
        def _stale() -> bool:
            if not os.path.exists(_LIB_PATH):
                return True
            src = os.path.abspath(os.path.join(_CSRC, "host_ops.cpp"))
            if os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(
                _LIB_PATH
            ):
                return True
            # exported symbol names live in the .dynstr section — a plain
            # byte scan detects pre-symbol-addition builds without dlopen
            with open(_LIB_PATH, "rb") as f:
                blob = f.read()
            required = (
                b"bilinear_resize_norm_f32",
                b"bilinear_resize_norm_strided_f32",
                b"bilinear_resize_f32",
                b"rasterize_winner_i32",
                b"pad_batch_f32",
            )
            return any(sym not in blob for sym in required)

        if _stale():
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        c = ctypes.c_int
        lib.bilinear_resize_f32.argtypes = [f32p, c, c, c, f32p, c, c]
        lib.bilinear_resize_norm_f32.argtypes = [
            f32p, c, c, c, f32p, c, c, f32p, f32p
        ]
        lib.bilinear_resize_norm_strided_f32.argtypes = [
            f32p, c, c, c, f32p, c, c, ctypes.c_long, f32p, f32p
        ]
        lib.rasterize_winner_i32.argtypes = [i32p, u8p, c, i32p, c, c, c]
        lib.pad_batch_f32.argtypes = [f32p, c, c, c, f32p, c, c, c]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def set_enabled(flag: bool) -> None:
    global _enabled
    _enabled = flag


def bilinear_resize(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Native-or-numpy torch-semantics bilinear resize. image [H, W, C]."""
    lib = _load() if _enabled else None
    if lib is None:
        from vibertgrid_tpu.data.transform import bilinear_resize as np_resize

        return np_resize(image, out_h, out_w)
    src = np.ascontiguousarray(image, np.float32)
    h, w, c = src.shape
    if (h, w) == (out_h, out_w):
        return src
    dst = np.empty((out_h, out_w, c), np.float32)
    lib.bilinear_resize_f32(src, h, w, c, dst, out_h, out_w)
    return dst


def bilinear_resize_norm(
    image: np.ndarray,
    out_h: int,
    out_w: int,
    mean: np.ndarray,
    std: np.ndarray,
) -> np.ndarray:
    """Fused torch-semantics bilinear resize + per-channel normalization
    (``(resize(image) - mean) / std``) — one pass, no intermediate arrays."""
    lib = _load() if _enabled else None
    if lib is None:
        out = bilinear_resize(image, out_h, out_w)
        return ((out - np.asarray(mean, np.float32))
                / np.asarray(std, np.float32)).astype(np.float32)
    src = np.ascontiguousarray(image, np.float32)
    h, w, c = src.shape
    dst = np.empty((out_h, out_w, c), np.float32)
    lib.bilinear_resize_norm_f32(
        src, h, w, c, dst, out_h, out_w,
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
    )
    return dst


def rasterize_winner(
    boxes: np.ndarray, mask: np.ndarray, h: int, w: int, stride: int = 1
) -> np.ndarray:
    """Host-side winner map (same semantics as ops.rasterize.box_winner_map)."""
    lib = _load() if _enabled else None
    if lib is None:
        out = np.zeros((h, w), np.int32)
        for i in range(len(boxes)):
            if not mask[i]:
                continue
            x0, y0, x1, y1 = (int(v) // stride for v in boxes[i])
            out[max(y0, 0) : min(y1, h), max(x0, 0) : min(x1, w)] = i + 1
        return out
    boxes = np.ascontiguousarray(boxes, np.int32)
    mask = np.ascontiguousarray(mask, np.uint8)
    out = np.empty((h, w), np.int32)
    lib.rasterize_winner_i32(boxes, mask, len(boxes), out, h, w, stride)
    return out


def bilinear_resize_norm_into(
    image: np.ndarray,
    dst: np.ndarray,
    out_h: int,
    out_w: int,
    mean: np.ndarray,
    std: np.ndarray,
) -> None:
    """Fused resize + normalize written DIRECTLY into the top-left
    ``[out_h, out_w]`` region of a (pre-zeroed, contiguous) padded canvas
    ``dst [bh, bw, c]`` — collation's pad copy (a full extra canvas
    write+read per sample) disappears. Releases the GIL (ctypes), so the
    loader's thread pool parallelises it across the batch."""
    lib = _load() if _enabled else None
    if lib is None:
        out = bilinear_resize(image, out_h, out_w)
        dst[:out_h, :out_w] = (
            (out - np.asarray(mean, np.float32))
            / np.asarray(std, np.float32)
        ).astype(np.float32)
        return
    src = np.ascontiguousarray(image, np.float32)
    h, w, c = src.shape
    assert dst.flags["C_CONTIGUOUS"] and dst.shape[2] == c
    lib.bilinear_resize_norm_strided_f32(
        src, h, w, c, dst, out_h, out_w, dst.shape[1] * c,
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
    )


def pad_into(image: np.ndarray, dst: np.ndarray) -> None:
    """Copy image [h,w,c] into the top-left of dst [bh,bw,c] (dst pre-zeroed)."""
    lib = _load() if _enabled else None
    h, w, c = image.shape
    if lib is None:
        dst[:h, :w] = image
        return
    lib.pad_batch_f32(
        np.ascontiguousarray(image, np.float32), h, w, c,
        dst, dst.shape[0], dst.shape[1], 0,
    )
