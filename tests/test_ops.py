"""Unit tests for core ops vs numpy oracles (reference-semantics parity)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vibertgrid_tpu.ops import (
    aggregate_token_embeddings,
    bertgrid_scatter,
    box_winner_map,
    frame_windows,
    rasterize_label_maps,
    roi_align,
    unframe_windows,
)
from tests.oracles import (
    aggregate_np,
    label_maps_np,
    roi_align_np,
    scatter_np,
)

RNG = np.random.default_rng(0)


def random_boxes(n, h, w, rng=RNG):
    x0 = rng.integers(0, w - 2, n)
    y0 = rng.integers(0, h - 2, n)
    x1 = x0 + rng.integers(1, w // 2, n)
    y1 = y0 + rng.integers(1, h // 4, n)
    return np.stack([x0, y0, np.minimum(x1, w), np.minimum(y1, h)], axis=1).astype(
        np.int32
    )


class TestRasterize:
    def test_winner_map_later_wins(self):
        boxes = np.array([[0, 0, 8, 8], [4, 4, 12, 12]], np.int32)
        mask = np.array([True, True])
        win = np.asarray(
            box_winner_map(jnp.asarray(boxes), jnp.asarray(mask), height=16, width=16)
        )
        assert win[5, 5] == 2  # overlap → later box
        assert win[1, 1] == 1
        assert win[15, 15] == 0

    def test_winner_map_masks_padding(self):
        boxes = np.array([[0, 0, 8, 8], [0, 0, 16, 16]], np.int32)
        mask = np.array([True, False])
        win = np.asarray(
            box_winner_map(jnp.asarray(boxes), jnp.asarray(mask), height=16, width=16)
        )
        assert win[10, 10] == 0

    @pytest.mark.parametrize("stride", [1, 8])
    def test_scatter_matches_reference_loop(self, stride):
        h, w, s, d = 64, 48, 37, 16
        boxes = random_boxes(s, h, w)
        mask = RNG.random(s) > 0.2
        emb = RNG.standard_normal((s, d)).astype(np.float32)
        got = np.asarray(
            bertgrid_scatter(
                jnp.asarray(emb),
                jnp.asarray(boxes),
                jnp.asarray(mask),
                height=h // stride,
                width=w // stride,
                stride=stride,
                chunk=8,
            )
        )
        want = scatter_np(emb, boxes, mask, h // stride, w // stride, stride)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_label_maps_match_reference_loop(self):
        h, w, s = 80, 64, 29
        boxes = random_boxes(s, h, w)
        mask = RNG.random(s) > 0.1
        classes = RNG.integers(0, 5, s).astype(np.int32)
        pn, cm = rasterize_label_maps(
            jnp.asarray(classes),
            jnp.asarray(boxes),
            jnp.asarray(mask),
            height=h,
            width=w,
            chunk=8,
        )
        pn_np, cm_np = label_maps_np(classes, boxes, mask, h, w)
        np.testing.assert_array_equal(np.asarray(pn), pn_np)
        np.testing.assert_array_equal(np.asarray(cm), cm_np)


class TestAggregate:
    @pytest.mark.parametrize("mode", ["mean", "first"])
    def test_matches_reference_loop(self, mode):
        t, s, d = 100, 12, 8
        # Tokens of the same segment are contiguous runs, like the dataset's
        # seg_indices (data/SROIE_dataset.py:115-139).
        seg_ids = np.sort(RNG.integers(0, s, t)).astype(np.int32)
        mask = np.ones(t, bool)
        mask[77:] = False  # tail padding
        tok = RNG.standard_normal((t, d)).astype(np.float32)
        got = np.asarray(
            aggregate_token_embeddings(
                jnp.asarray(tok),
                jnp.asarray(seg_ids),
                jnp.asarray(mask),
                num_segments=s,
                mode=mode,
            )
        )
        want = aggregate_np(tok, seg_ids, mask, s, mode)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_batched(self):
        tok = RNG.standard_normal((2, 20, 4)).astype(np.float32)
        seg = np.tile(np.repeat(np.arange(5), 4), (2, 1)).astype(np.int32)
        mask = np.ones((2, 20), bool)
        out = aggregate_token_embeddings(
            jnp.asarray(tok), jnp.asarray(seg), jnp.asarray(mask),
            num_segments=5, mode="mean",
        )
        assert out.shape == (2, 5, 4)


class TestWindows:
    def test_roundtrip_and_framing(self):
        b, w = 2, 3
        t = w * 510
        tokens = RNG.integers(1, 30000, (b, t)).astype(np.int32)
        mask = np.ones((b, t), np.int32)
        mask[:, 900:] = 0
        ids, m = frame_windows(jnp.asarray(tokens), jnp.asarray(mask))
        assert ids.shape == (b * w, 512)
        assert np.all(np.asarray(ids)[:, 0] == 101)
        assert np.all(np.asarray(ids)[:, -1] == 102)
        assert np.all(np.asarray(m)[:, 0] == 1) and np.all(np.asarray(m)[:, -1] == 1)
        # window payloads rebuild the original stream
        emb = np.asarray(ids)[:, :, None].astype(np.float32)
        back = unframe_windows(jnp.asarray(emb), batch_size=b)
        np.testing.assert_array_equal(np.asarray(back)[..., 0].astype(np.int32), tokens)

    def test_reference_sep_placement(self):
        """With ``seq_len``, [SEP] sits at 1 + the window's slice width —
        the reference's [CLS] slice [SEP] pads framing
        (BERTgrid_generator.py:106-129), whose position tracks the
        batch-max corpus length, not the bucketed padding."""
        b, w = 2, 2
        t = w * 510
        tokens = RNG.integers(1, 30000, (b, t)).astype(np.int32)
        mask = np.zeros((b, t), np.int32)
        mask[0, :700] = 1  # batch max L = 700
        mask[1, :300] = 1
        ids, m = frame_windows(
            jnp.asarray(tokens), jnp.asarray(mask),
            seq_len=jnp.asarray(700, jnp.int32),
        )
        ids, m = np.asarray(ids), np.asarray(m)
        assert ids.shape == (b * w, 512)
        # full first windows: SEP at the end (width 510)
        for row in (0, 2):
            assert ids[row, 0] == 101 and ids[row, 511] == 102
            assert m[row, 511] == 1
        # second windows: width = 700 - 510 = 190 -> SEP at 191, tail PAD
        for row in (1, 3):
            assert ids[row, 191] == 102 and m[row, 191] == 1
            assert ids[row, 511] == 0 and m[row, 511] == 0
        # sample 1's window-2 payload positions are all mask 0 except SEP
        assert m[3, 1:191].sum() == 0
        # valid payload tokens/mask pass through untouched
        np.testing.assert_array_equal(ids[0, 1:511], tokens[0, :510])
        np.testing.assert_array_equal(m[1, 1:191], mask[0, 510:700])


class TestRoiAlign:
    def _run(self, hf, wf, c, rois_img, **kw):
        feat = RNG.standard_normal((hf, wf, c)).astype(np.float32)
        mask = np.ones(len(rois_img), bool)
        got = np.asarray(
            roi_align(
                jnp.asarray(feat)[None],
                jnp.asarray(rois_img, dtype=jnp.float32)[None],
                jnp.asarray(mask)[None],
                **kw,
            )
        )[0]
        want = roi_align_np(
            feat,
            np.asarray(rois_img, np.float64),
            output_size=kw.get("output_size", 7),
            spatial_scale=kw.get("spatial_scale", 0.25),
            sampling_ratio=kw.get("sampling_ratio", -1),
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_matches_torchvision_semantics_adaptive(self):
        # Text-segment-like boxes in image coords on a stride-4 map.
        rois = np.array(
            [
                [11.4, 12.3, 54.1, 54.1],
                [24.1, 34.1, 56.7, 56.7],
                [34.1, 4.1, 56.7, 7.1],   # thin line → roi < 1 clamp path
                [0.0, 0.0, 160.0, 24.0],  # full-width line
                [100.0, 90.0, 140.0, 98.0],
            ],
            np.float32,
        )
        self._run(32, 48, 5, rois)

    def test_fixed_sampling_ratio(self):
        rois = np.array([[8.0, 8.0, 72.0, 40.0]], np.float32)
        self._run(24, 24, 3, rois, sampling_ratio=2)

    def test_edge_boxes(self):
        # Boxes touching / exceeding borders exercise the clamp + drop paths.
        rois = np.array(
            [[-4.0, -4.0, 20.0, 20.0], [100.0, 80.0, 140.0, 100.0]], np.float32
        )
        self._run(20, 28, 2, rois)

    def test_masked_rois_zero(self):
        feat = RNG.standard_normal((16, 16, 2)).astype(np.float32)
        rois = np.array([[0, 0, 32, 32], [0, 0, 32, 32]], np.float32)
        mask = np.array([True, False])
        out = np.asarray(
            roi_align(
                jnp.asarray(feat)[None],
                jnp.asarray(rois)[None],
                jnp.asarray(mask)[None],
            )
        )[0]
        assert np.abs(out[0]).sum() > 0
        assert np.abs(out[1]).sum() == 0


class TestHashDropout:
    def test_rate_and_scale(self):
        from vibertgrid_tpu.ops.dropout import hash_dropout

        x = jnp.ones((1000, 128), jnp.float32)
        y = np.asarray(hash_dropout(x, jnp.int32(7), 0.1))
        kept = y > 0
        assert abs(kept.mean() - 0.9) < 0.01
        np.testing.assert_allclose(y[kept], 1.0 / 0.9, rtol=1e-6)
        # deterministic in the seed; different seeds differ
        y2 = np.asarray(hash_dropout(x, jnp.int32(7), 0.1))
        np.testing.assert_array_equal(y, y2)
        y3 = np.asarray(hash_dropout(x, jnp.int32(8), 0.1))
        assert (y != y3).any()

    def test_gradient_is_mask(self):
        from vibertgrid_tpu.ops.dropout import hash_dropout

        x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 32)),
                        jnp.float32)
        seed = jnp.int32(3)
        g = jax.grad(lambda v: jnp.sum(hash_dropout(v, seed, 0.25)))(x)
        y = hash_dropout(jnp.ones_like(x), seed, 0.25)
        np.testing.assert_allclose(np.asarray(g), np.asarray(y), rtol=1e-6)


class TestSplitPointwise:
    def test_matches_concat_conv(self):
        import flax.linen as nn
        from vibertgrid_tpu.models.resnet_fpn import (
            _SplitPointwise,
            _upsample_nearest,
        )

        rng = np.random.default_rng(0)
        # levels at strides 32/16/8/4 of a 64×32 image
        shapes = [(2, 2, 1, 8), (2, 4, 2, 8), (2, 8, 4, 8), (2, 16, 8, 8)]
        xs = [jnp.asarray(rng.standard_normal(s), jnp.float32) for s in shapes]
        scales = [8, 4, 2, 1]

        mod = _SplitPointwise(16)
        params = mod.init(jax.random.PRNGKey(0), xs, scales)
        got = mod.apply(params, xs, scales)

        concat = jnp.concatenate(
            [_upsample_nearest(x, s) if s > 1 else x for x, s in zip(xs, scales)],
            axis=-1,
        )
        conv = nn.Conv(16, (1, 1), use_bias=False)
        want = conv.apply(
            {"params": {"kernel": params["params"]["kernel"]}}, concat
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestNormLayers:
    """The bf16-I/O norms must equal flax's modules exactly in fp32 mode
    (same param/batch_stats trees) and stay close in bf16."""

    def test_batchnorm_matches_flax_fp32(self):
        import flax.linen as nn
        from vibertgrid_tpu.models.norm import BatchNorm

        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 6, 6, 16)), jnp.float32
        )
        ours = BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
        theirs = nn.BatchNorm(
            use_running_average=False, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32,
        )
        vo = ours.init(jax.random.PRNGKey(0), x)
        vt = theirs.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(vo) == jax.tree_util.tree_structure(vt)
        yo, so = ours.apply(vo, x, mutable=["batch_stats"])
        yt, st = theirs.apply(vt, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yo), np.asarray(yt), atol=2e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(so), jax.tree_util.tree_leaves(st)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
        # training mode without mutable batch_stats must raise (flax parity)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            ours.apply(vo, x)
        # eval mode
        ye_ours = BatchNorm(use_running_average=True).apply(vo, x)
        ye_flax = nn.BatchNorm(use_running_average=True, dtype=jnp.float32).apply(vt, x)
        np.testing.assert_allclose(
            np.asarray(ye_ours), np.asarray(ye_flax), atol=2e-6
        )

    def test_layernorm_matches_flax_fp32(self):
        import flax.linen as nn
        from vibertgrid_tpu.models.norm import LayerNorm

        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((8, 32)), jnp.float32
        )
        ours = LayerNorm(epsilon=1e-12)
        theirs = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32)
        vo = ours.init(jax.random.PRNGKey(0), x)
        vt = theirs.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(vo) == jax.tree_util.tree_structure(vt)
        np.testing.assert_allclose(
            np.asarray(ours.apply(vo, x)),
            np.asarray(theirs.apply(vt, x)),
            atol=2e-6,
        )

    def test_bf16_io_dtype_and_accuracy(self):
        from vibertgrid_tpu.models.norm import BatchNorm, LayerNorm

        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((4, 8, 8, 32)), jnp.bfloat16
        )
        bn = BatchNorm(use_running_average=False, dtype=jnp.bfloat16)
        v = bn.init(jax.random.PRNGKey(0), x)
        y, _ = bn.apply(v, x, mutable=["batch_stats"])
        assert y.dtype == jnp.bfloat16
        yf = BatchNorm(use_running_average=False, dtype=jnp.float32).apply(
            v, x.astype(jnp.float32), mutable=["batch_stats"]
        )[0]
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(yf), atol=0.05
        )
        ln = LayerNorm(dtype=jnp.bfloat16)
        vl = ln.init(jax.random.PRNGKey(0), x[0, 0])
        assert ln.apply(vl, x[0, 0]).dtype == jnp.bfloat16
