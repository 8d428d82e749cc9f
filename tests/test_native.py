"""Native host-ops library vs numpy fallbacks."""

import numpy as np
import pytest

from vibertgrid_tpu.data import native
from vibertgrid_tpu.data.transform import bilinear_resize as np_resize

RNG = np.random.default_rng(3)

needs_native = pytest.mark.skipif(
    not native.native_available(), reason="g++ toolchain unavailable"
)


@needs_native
def test_bilinear_matches_numpy():
    img = RNG.standard_normal((37, 29, 3)).astype(np.float32)
    got = native.bilinear_resize(img, 64, 48)
    want = np_resize(img, 64, 48)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@needs_native
def test_winner_matches_python():
    boxes = np.array([[0, 0, 10, 10], [5, 5, 20, 20], [100, 100, 120, 110]],
                     np.int32)
    mask = np.array([1, 1, 0], np.uint8)
    got = native.rasterize_winner(boxes, mask, 32, 32, stride=1)
    native.set_enabled(False)
    try:
        want = native.rasterize_winner(boxes, mask, 32, 32, stride=1)
    finally:
        native.set_enabled(True)
    np.testing.assert_array_equal(got, want)
    assert got[7, 7] == 2 and got[1, 1] == 1 and got[25, 25] == 0


@needs_native
def test_pad_into():
    img = RNG.standard_normal((10, 8, 3)).astype(np.float32)
    dst = np.zeros((16, 12, 3), np.float32)
    native.pad_into(img, dst)
    np.testing.assert_array_equal(dst[:10, :8], img)
    assert dst[10:].sum() == 0 and dst[:, 8:].sum() == 0


@needs_native
def test_native_faster_than_numpy_resize():
    import time

    img = RNG.standard_normal((1000, 700, 3)).astype(np.float32)
    native.bilinear_resize(img, 800, 560)  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        native.bilinear_resize(img, 800, 560)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        np_resize(img, 800, 560)
    t_numpy = time.perf_counter() - t0
    # informational bound: native should not be slower than numpy by >2x
    assert t_native < 2 * t_numpy, (t_native, t_numpy)


def test_bilinear_resize_norm_matches_unfused():
    from vibertgrid_tpu.data import native

    rng = np.random.default_rng(5)
    img = rng.random((37, 53, 3)).astype(np.float32)
    mean = np.asarray([0.9, 0.8, 0.7], np.float32)
    std = np.asarray([0.2, 0.25, 0.3], np.float32)
    for oh, ow in [(20, 30), (37, 53)]:
        want = (native.bilinear_resize(img, oh, ow) - mean) / std
        got = native.bilinear_resize_norm(img, oh, ow, mean, std)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
        # numpy fallback path agrees too
        native.set_enabled(False)
        try:
            got_np = native.bilinear_resize_norm(img, oh, ow, mean, std)
        finally:
            native.set_enabled(True)
        np.testing.assert_allclose(got_np, want, rtol=2e-6, atol=2e-6)


def test_resize_norm_into_matches_resize_plus_pad():
    """The canvas-fused op == bilinear_resize_norm + pad_into, native and
    numpy paths, including the same-size (pure normalize) degenerate."""
    rng = np.random.default_rng(3)
    mean = np.asarray([0.5, 0.4, 0.3], np.float32)
    std = np.asarray([0.2, 0.25, 0.3], np.float32)
    for h, w, oh, ow, bh, bw in (
        (123, 87, 256, 181, 320, 192),
        (64, 64, 64, 64, 128, 128),   # same-size fast path
        (200, 300, 150, 225, 192, 256),
    ):
        img = rng.random((h, w, 3)).astype(np.float32)
        want = np.zeros((bh, bw, 3), np.float32)
        native.pad_into(
            native.bilinear_resize_norm(img, oh, ow, mean, std), want
        )
        got = np.zeros((bh, bw, 3), np.float32)
        native.bilinear_resize_norm_into(img, got, oh, ow, mean, std)
        np.testing.assert_array_equal(got, want)

        if native.native_available():
            native.set_enabled(False)
            try:
                got_np = np.zeros((bh, bw, 3), np.float32)
                native.bilinear_resize_norm_into(img, got_np, oh, ow, mean, std)
            finally:
                native.set_enabled(True)
            np.testing.assert_allclose(got_np, want, atol=1e-6)


def test_collator_pool_matches_serial():
    """Collation with the loader's thread pool == serial collation."""
    from concurrent.futures import ThreadPoolExecutor

    from vibertgrid_tpu.data.dataset import Collator, Sample
    from vibertgrid_tpu.data.transform import ImageTransform

    rng = np.random.default_rng(9)
    samples = []
    for _ in range(6):
        h, w = int(rng.integers(90, 300)), int(rng.integers(90, 300))
        n = int(rng.integers(1, 40))
        boxes = np.zeros((n, 4), np.int32)
        boxes[:, 0] = rng.integers(0, w - 30, n)
        boxes[:, 1] = rng.integers(0, h - 18, n)
        boxes[:, 2] = boxes[:, 0] + 20
        boxes[:, 3] = boxes[:, 1] + 12
        samples.append(
            Sample(
                image=rng.random((h, w, 3)).astype(np.float32),
                tokens=rng.integers(5, 40, n * 2).astype(np.int32),
                seg_ids=np.repeat(np.arange(n, dtype=np.int32), 2),
                boxes=boxes,
                seg_classes=rng.integers(0, 5, n).astype(np.int32),
                texts=[f"t{i}" for i in range(n)],
            )
        )
    coll = Collator(ImageTransform([0.5] * 3, [0.25] * 3, [256, 320], 256, 400))
    a, _ = coll(samples, train=True, rng=np.random.default_rng(4))
    with ThreadPoolExecutor(4) as pool:
        b, _ = coll(samples, train=True, rng=np.random.default_rng(4), pool=pool)
    for f in a.__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )
