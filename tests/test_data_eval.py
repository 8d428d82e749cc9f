"""Tests for the data pipeline, seqeval-lite metrics, and entity joining."""

import numpy as np
import pytest

from vibertgrid_tpu.data import Collator, ImageTransform, KIEDataset, data_loader
from vibertgrid_tpu.data.synthetic import (
    make_synthetic_root,
    make_test_tokenizer,
    synthetic_spec,
)
from vibertgrid_tpu.data.transform import bilinear_resize, bucket_hw
from vibertgrid_tpu.eval.entities import join_entities, sroie_result_filter
from vibertgrid_tpu.eval.seqeval_lite import bio_f1, get_entities


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    make_synthetic_root(root, n_train=4, n_test=2)
    tokenizer = make_test_tokenizer(root)
    return root, tokenizer


class TestTransform:
    def test_bilinear_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        img = rng.standard_normal((37, 23, 3)).astype(np.float32)
        out = bilinear_resize(img, 64, 48)
        want = (
            F.interpolate(
                torch.from_numpy(img).permute(2, 0, 1)[None],
                size=(64, 48),
                mode="bilinear",
                align_corners=False,
            )[0]
            .permute(1, 2, 0)
            .numpy()
        )
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)

    def test_resize_respects_min_max(self):
        tr = ImageTransform([0.5] * 3, [0.2] * 3, [320], 512, 800)
        img = np.ones((1000, 500, 3), np.float32)
        boxes = np.array([[10, 20, 100, 200]], np.int32)
        out, b, (h, w) = tr(img, boxes, train=False)
        assert min(h, w) <= 512 and max(h, w) <= 800
        # aspect preserved within rounding
        assert abs(h / w - 2.0) < 0.01
        # boxes scaled by the same ratios
        assert b[0, 2] == int(100 * w / 500)
        assert b[0, 3] == int(200 * h / 1000)

    def test_bucketing(self):
        assert bucket_hw(513, 385) == (576, 448)
        assert bucket_hw(512, 384) == (512, 384)


class TestDataset:
    def test_load_and_collate(self, synth):
        root, tokenizer = synth
        spec = synthetic_spec()
        ds = KIEDataset(f"{root}/train", spec, tokenizer, train=True)
        assert len(ds) == 4
        s = ds[0]
        assert s.tokens.ndim == 1 and len(s.tokens) == len(s.seg_ids)
        assert len(s.boxes) == len(s.seg_classes) == len(s.texts)

        tr = ImageTransform(spec.image_mean, spec.image_std, [320], 512, 800)
        coll = Collator(tr)
        batches = list(
            data_loader(ds, coll, batch_size=2, train=True, seed=0)
        )
        assert len(batches) == 2
        batch, aux = batches[0]
        b, h, w, c = batch.images.shape
        assert (b, c) == (2, 3) and h % 64 == 0 and w % 64 == 0
        assert batch.tokens.shape[1] % 510 == 0
        assert batch.boxes.shape[1] in (32, 64, 128, 256, 512)
        assert batch.box_mask[0].sum() == aux.n_segments[0]
        # valid boxes are within the padded image
        valid_boxes = batch.boxes[batch.box_mask]
        assert (valid_boxes[:, 2] <= w).all() and (valid_boxes[:, 3] <= h).all()

    def test_test_split_has_keys(self, synth):
        root, tokenizer = synth
        ds = KIEDataset(f"{root}/test", synthetic_spec(), tokenizer, train=False)
        s = ds[0]
        assert s.key_dict is not None and "company" in s.key_dict

    def test_bio_root_covers_all_entity_types(self, tmp_path):
        """A tag_scheme='BIO' root must decode (via the BIO tag table) to
        well-formed runs covering EVERY non-background class.

        Regression for the r4 CRF "regression": the roberta convergence
        config evaluated a tag_mode='BIO' model against a root whose
        data_class held plain CLASS ids, silently relabeling date→I-company
        and address/total→B-/I-date — the per-type report then structurally
        showed only 2 entity types (logs/requalify/r4_conv_roberta.log)."""
        root = str(tmp_path / "bio")
        make_synthetic_root(root, n_train=2, n_test=2, seed=3, tag_scheme="BIO")
        spec = synthetic_spec()
        tag_to_idx = spec.tag_to_idx("BIO")
        idx_to_tag = {v: k for k, v in tag_to_idx.items()}
        tokenizer = make_test_tokenizer(root)
        seen = set()
        for split in ("train", "test"):
            ds = KIEDataset(f"{root}/{split}", spec, tokenizer, train=split == "train")
            for i in range(len(ds)):
                tags = [idx_to_tag[int(c)] for c in ds[i].seg_classes]
                for typ, start, end in get_entities(tags):
                    seen.add(typ)
                # every I- continues a same-type B-/I- (well-formed IOB2)
                for prev, cur in zip(["O"] + tags, tags):
                    if cur.startswith("I-"):
                        assert prev in (f"B-{cur[2:]}", cur), (prev, cur)
        assert seen == set(spec.class_list[1:]), seen


class TestSeqevalLite:
    def test_entities_bio(self):
        seq = ["B-a", "I-a", "O", "B-b", "B-a", "I-b"]
        ents = get_entities(seq)
        assert ("a", 0, 1) in ents and ("b", 3, 3) in ents
        assert ("a", 4, 4) in ents and ("b", 5, 5) in ents

    def test_perfect_f1(self):
        y = [["B-a", "I-a", "O", "B-b"]]
        p, r, f = bio_f1(y, y, "micro")
        assert (p, r, f) == (1.0, 1.0, 1.0)

    def test_partial(self):
        y_true = [["B-a", "I-a", "O", "B-b"]]
        y_pred = [["B-a", "O", "O", "B-b"]]
        p, r, f = bio_f1(y_true, y_pred, "micro")
        # pred entities: a(0,0) [wrong span], b(3,3) [right] → P=1/2, R=1/2
        assert p == 0.5 and r == 0.5 and f == 0.5

    def test_macro_vs_micro(self):
        y_true = [["B-a", "B-a", "B-b"]]
        y_pred = [["B-a", "B-a", "O"]]
        micro = bio_f1(y_true, y_pred, "micro")[2]
        macro = bio_f1(y_true, y_pred, "macro")[2]
        assert micro > macro  # b has F1 0

    def test_per_type_f1_collapse_signature(self):
        from vibertgrid_tpu.eval.seqeval_lite import per_type_f1

        y_true = [["B-a", "I-a", "O", "B-b", "B-c"]]
        # majority-class collapse: every token predicted as type a —
        # at most ONE type can score (the learnability gate's signature)
        y_collapse = [["B-a", "I-a", "B-a", "B-a", "B-a"]]
        per = per_type_f1(y_true, y_collapse)
        assert sum(1 for v in per.values() if v > 0) <= 1, per
        # real learning: two types right, one missed → exactly 2 nonzero
        y_learned = [["B-a", "I-a", "O", "B-b", "O"]]
        per = per_type_f1(y_true, y_learned)
        assert per["a"] == 1.0 and per["b"] == 1.0 and per["c"] == 0.0

    @pytest.mark.skipif(True, reason="seqeval not installed in sandbox")
    def test_against_real_seqeval(self):
        pass


class TestJoinEntities:
    def test_runs_merge_and_best_candidate(self):
        texts = ["acme", "corp", "x", "12.50"]
        probs = np.array(
            [
                [0.1, 0.8, 0.05, 0.03, 0.02],
                [0.1, 0.7, 0.1, 0.05, 0.05],
                [0.9, 0.05, 0.02, 0.02, 0.01],
                [0.05, 0.02, 0.02, 0.01, 0.9],
            ],
            np.float32,
        )
        best = join_entities(probs, texts, 5)
        assert best[1] == "acme corp"
        # final-segment quirk: the last run files under the PREVIOUS class
        # (class 0, which already holds 'x' at equal score), so class 4
        # stays empty and class 0 keeps its first max-score candidate.
        assert best[4] == ""
        assert best[0] == "x"

    def test_chinese_concatenation(self):
        texts = ["数", "学"]
        probs = np.array(
            [[0.1, 0.9], [0.2, 0.8]], np.float32
        )
        best = join_entities(probs, texts, 2, language="chn")
        assert best[1] == "数学"

    def test_hyphen_join(self):
        texts = ["multi-", "line"]
        probs = np.array([[0.1, 0.9], [0.2, 0.8]], np.float32)
        best = join_entities(probs, texts, 2)
        assert best[1] == "multi-line"


class TestSroieFilter:
    def test_date(self):
        assert sroie_result_filter("25/03/2019 something", 2) == "25/03/2019"
        assert sroie_result_filter("not a date", 2) is None

    def test_total(self):
        assert sroie_result_filter("72.10", 4) == "72.10"
        assert sroie_result_filter("RM 72.10", 4) is None

    def test_passthrough(self):
        assert sroie_result_filter("ACME CORP", 1) == "ACME CORP"


def test_data_loader_num_workers_matches_serial(synth):
    """Thread-pool sample loading yields identical batches to the serial path."""
    root, tokenizer = synth
    from vibertgrid_tpu.data import Collator, ImageTransform, KIEDataset, data_loader
    from vibertgrid_tpu.data.synthetic import synthetic_spec

    ds = KIEDataset(f"{root}/train", synthetic_spec(), tokenizer, train=True)
    tr = ImageTransform([0.9] * 3, [0.15] * 3, [256], 256, 400)
    col = Collator(tr)
    serial = list(data_loader(ds, col, 2, train=True, seed=3))
    threaded = list(data_loader(ds, col, 2, train=True, seed=3, num_workers=4))
    assert len(serial) == len(threaded)
    for (b1, _), (b2, _) in zip(serial, threaded):
        np.testing.assert_array_equal(np.asarray(b1.tokens), np.asarray(b2.tokens))
        np.testing.assert_array_equal(np.asarray(b1.images), np.asarray(b2.images))


def test_prefetch_to_device_order_and_errors():
    from vibertgrid_tpu.data import prefetch_to_device

    items = [(i, {"aux": i}) for i in range(7)]
    out = list(prefetch_to_device(iter(items), size=2, put=False))
    assert out == items

    def boom():
        yield (0, None)
        raise RuntimeError("producer failed")

    it = prefetch_to_device(boom(), put=False)
    assert next(it) == (0, None)
    import pytest

    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)


def test_fast_tokenizer_parity(tmp_path):
    """BertTokenizerFast must produce the same wordpieces/ids as the slow
    tokenizer the reference uses (the driver defaults to fast)."""
    from vibertgrid_tpu.data.synthetic import write_vocab
    from vibertgrid_tpu.train.driver import build_tokenizer

    vocab = write_vocab(str(tmp_path))
    slow = build_tokenizer(
        {"tokenizer_path": vocab, "bert_version": "bert-base-uncased",
         "fast_tokenizer": False}
    )
    fast = build_tokenizer(
        {"tokenizer_path": vocab, "bert_version": "bert-base-uncased"}
    )
    assert type(fast).__name__ == "BertTokenizerFast"
    texts = [
        "total 12.50", "DATE: 2021-03-04", "lorem ipsum dolor",
        "company ltd.", "unknownword xyzzy", "a,b;c", "  spaced  out  ",
    ]
    for t in texts:
        ts, tf = slow.tokenize(t), fast.tokenize(t)
        assert ts == tf, (t, ts, tf)
        assert slow.convert_tokens_to_ids(ts) == fast.convert_tokens_to_ids(tf)


class TestEphoieFilter:
    """EPHOIE post filters (eval_EPHOIE.py:32-155 semantics)."""

    def test_subject_match_mid_string(self):
        from vibertgrid_tpu.eval.entities import ephoie_result_filter

        assert ephoie_result_filter("三年级数学期末", 2) == "数学"
        # subject at position 0 is NOT matched (reference uses find(...) > 0)
        assert ephoie_result_filter("数学测试", 2) == "数学测试"

    def test_grade_strips_lead_and_keywords(self):
        from vibertgrid_tpu.eval.entities import ephoie_result_filter

        # leading "年级" drops the first two chars; keyword chars dropped
        assert ephoie_result_filter("年级三", 1) == "三"
        assert ephoie_result_filter("七年级", 1) == "七"

    def test_school_and_default_strip(self):
        from vibertgrid_tpu.eval.entities import ephoie_result_filter

        assert ephoie_result_filter("实验中学姓名", 3) == "实验中学"
        assert ephoie_result_filter("张三：", 0) == "张三"


class TestLongCorpus:
    """No-silent-truncation guarantees (VERDICT r1 #3): arbitrary-length
    corpora round-trip losslessly through collation, matching the reference's
    unbounded ``win_count = seq_len // 510 + 1`` windowing
    (``model/BERTgrid_generator.py:81-146``)."""

    @staticmethod
    def _long_sample(n_seg=600, tok_per_seg=4, seed=0):
        from vibertgrid_tpu.data.dataset import Sample

        rng = np.random.default_rng(seed)
        n_tok = n_seg * tok_per_seg
        h, w = 256, 300
        x0 = rng.integers(0, w - 20, n_seg)
        y0 = rng.integers(0, h - 12, n_seg)
        boxes = np.stack(
            [x0, y0, x0 + rng.integers(4, 20, n_seg), y0 + rng.integers(4, 12, n_seg)],
            1,
        ).astype(np.int32)
        return Sample(
            image=rng.random((h, w, 3)).astype(np.float32),
            tokens=rng.integers(5, 40, n_tok).astype(np.int32),
            seg_ids=np.repeat(np.arange(n_seg, dtype=np.int32), tok_per_seg),
            boxes=boxes,
            seg_classes=rng.integers(0, 5, n_seg).astype(np.int32),
            texts=[f"t{i}" for i in range(n_seg)],
        )

    def _collator(self):
        tr = ImageTransform([0.5] * 3, [0.25] * 3, [256], 256, 400)
        return Collator(tr)

    def test_collate_lossless_many_windows(self):
        # 600 segments (> the 512 ladder top), 2400 tokens (5 windows).
        s = self._long_sample()
        batch, aux = self._collator()([s], train=False)
        n_tok = len(s.tokens)
        assert batch.tokens.shape[1] == 6 * 510  # 5 windows → bucket 6
        assert batch.boxes.shape[1] == 1024      # 600 → next 512-multiple
        assert int(batch.token_mask.sum()) == n_tok
        np.testing.assert_array_equal(batch.tokens[0, :n_tok], s.tokens)
        np.testing.assert_array_equal(batch.seg_ids[0, :n_tok], s.seg_ids)
        assert int(batch.box_mask.sum()) == 600
        np.testing.assert_array_equal(batch.seg_classes[0, :600], s.seg_classes)

    def test_max_windows_cap_raises_not_truncates(self):
        tr = ImageTransform([0.5] * 3, [0.25] * 3, [256], 256, 400)
        coll = Collator(tr, max_windows=3)
        with pytest.raises(ValueError, match="silently truncated"):
            coll([self._long_sample()], train=False)

    def test_model_forward_many_windows(self):
        """A ≥4-window, ≥600-segment batch flows through the full model."""
        import jax

        from tests.test_model import tiny_config
        from vibertgrid_tpu.models import ViBERTgridNet

        s = self._long_sample(n_seg=600, tok_per_seg=4)  # 2400 tok, 5 win
        batch, _ = self._collator()([s], train=False)
        model = ViBERTgridNet(tiny_config())
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch,
            train=False,
            compute_loss=False,
            key=jax.random.PRNGKey(2),
        )
        out = model.apply(
            variables, batch, train=False, compute_loss=False,
            key=jax.random.PRNGKey(0),
        )
        assert out.pred_label.shape[:2] == (1, 1024)
        assert np.isfinite(np.asarray(out.pred_label)).all()


class TestBucketedEvalLoader:
    def test_identical_metrics_to_bs1(self, synth):
        """Batched bucketed validation must reproduce the bs-1 loop's
        metrics exactly (VERDICT r1 #4) — model outputs are
        batch-independent in eval mode and padding entries are skipped."""
        import jax

        from tests.test_model import tiny_config
        from vibertgrid_tpu.data.dataset import bucketed_eval_loader
        from vibertgrid_tpu.eval.harness import validate
        from vibertgrid_tpu.models import ViBERTgridNet
        from vibertgrid_tpu.train.state import create_train_state, make_eval_step

        root, tokenizer = synth
        spec = synthetic_spec()
        ds = KIEDataset(f"{root}/test", spec, tokenizer, train=False)
        tr = ImageTransform(spec.image_mean, spec.image_std, [256], 256, 400)
        coll = Collator(tr)

        import optax

        model = ViBERTgridNet(tiny_config())
        batch0, _ = next(iter(data_loader(ds, coll, 1, train=False)))
        state = create_train_state(model, optax.sgd(1e-3), batch0, seed=0)
        eval_step = make_eval_step(model)

        kw = dict(
            eval_mode="seq_and_str",
            tag_to_idx=spec.tag_to_idx("B"),
            verbose=False,
        )
        r1 = validate(
            eval_step, state, data_loader(ds, coll, 1, train=False), spec, **kw
        )
        rb = validate(
            eval_step, state, bucketed_eval_loader(ds, coll, 8), spec, **kw
        )
        for k in (
            "precision", "recall", "F1", "token_F1", "token_accuracy",
            "primary_F1",
        ):
            assert rb[k] == pytest.approx(r1[k], abs=1e-9), k
        assert set(rb["per_sample"]) == set(r1["per_sample"])
        for name in r1["per_sample"]:
            assert rb["per_sample"][name]["pred"] == r1["per_sample"][name]["pred"]

    def test_uint8_eval_wire_matches_fp32(self, synth):
        """The uint8 eval wire (Collator(emit_uint8=True) +
        make_eval_step(image_stats=...), 4× fewer H2D bytes — the serving
        wire reused for validation) must reproduce the fp32 path's
        predictions up to the ≤0.5/255 input quantization: near-identical
        probabilities, metrics within tolerance (exact-equality would be
        flaky for borderline argmaxes, ADVICE r4 #4)."""
        import jax

        from tests.test_model import tiny_config
        from vibertgrid_tpu.data.dataset import bucketed_eval_loader
        from vibertgrid_tpu.eval.harness import validate
        from vibertgrid_tpu.models import ViBERTgridNet
        from vibertgrid_tpu.train.state import create_train_state, make_eval_step

        root, tokenizer = synth
        spec = synthetic_spec()
        ds = KIEDataset(f"{root}/test", spec, tokenizer, train=False)
        tr = ImageTransform(spec.image_mean, spec.image_std, [256], 256, 400)
        coll = Collator(tr)
        coll_u8 = Collator(tr, emit_uint8=True)

        import optax

        model = ViBERTgridNet(tiny_config())
        batch0, _ = next(iter(data_loader(ds, coll, 1, train=False)))
        state = create_train_state(model, optax.sgd(1e-3), batch0, seed=0)
        eval_step = make_eval_step(model)
        eval_u8 = make_eval_step(
            model, image_stats=(spec.image_mean, spec.image_std)
        )

        # per-batch probabilities: same bucket order for both collators
        # (shapes are identical, only the image dtype differs)
        b32 = list(bucketed_eval_loader(ds, coll, 4))
        bu8 = list(bucketed_eval_loader(ds, coll_u8, 4))
        assert len(b32) == len(bu8)
        (batch32, aux32), (batch8, aux8) = b32[0], bu8[0]
        assert batch8.images.dtype == np.uint8
        p32 = np.asarray(eval_step(state, batch32).pred_label, np.float32)
        p8 = np.asarray(
            eval_u8(
                state, batch8, np.asarray(aux8.image_sizes, np.int32)
            ).pred_label,
            np.float32,
        )
        assert float(np.abs(p32 - p8).max()) < 0.05

        kw = dict(
            eval_mode="seq_and_str",
            tag_to_idx=spec.tag_to_idx("B"),
            verbose=False,
        )
        r32 = validate(
            eval_step, state, bucketed_eval_loader(ds, coll, 4), spec, **kw
        )
        ru8 = validate(
            eval_u8, state, bucketed_eval_loader(ds, coll_u8, 4), spec, **kw
        )
        for k in (
            "precision", "recall", "F1", "token_F1", "token_accuracy",
            "primary_F1",
        ):
            assert ru8[k] == pytest.approx(r32[k], abs=0.05), k

    def test_groups_and_padding(self, synth):
        from vibertgrid_tpu.data.dataset import bucketed_eval_loader

        root, tokenizer = synth
        spec = synthetic_spec()
        ds = KIEDataset(f"{root}/test", spec, tokenizer, train=False)
        tr = ImageTransform(spec.image_mean, spec.image_std, [256], 256, 400)
        coll = Collator(tr)
        n_real_total = 0
        for batch, aux in bucketed_eval_loader(ds, coll, 8):
            b = batch.images.shape[0]
            assert b & (b - 1) == 0, "batch sizes are powers of two"
            assert len(aux.n_segments) == b
            n_real_total += sum(1 for n in aux.n_segments if n > 0)
        assert n_real_total == len(ds)


class TestCollatorFuzz:
    """Randomized mixed-size batches through the collator: every sample
    round-trips losslessly whatever bucket combination the batch lands in
    (window count, segment ladder incl. beyond-top extension, image hw)."""

    def _sample(self, rng, n_seg, tok_per_seg, h, w):
        boxes = np.zeros((n_seg, 4), np.int32)
        boxes[:, 0] = rng.integers(0, max(w - 30, 1), n_seg)
        boxes[:, 1] = rng.integers(0, max(h - 18, 1), n_seg)
        boxes[:, 2] = boxes[:, 0] + rng.integers(4, 28, n_seg)
        boxes[:, 3] = boxes[:, 1] + rng.integers(4, 16, n_seg)
        from vibertgrid_tpu.data.dataset import Sample

        return Sample(
            image=rng.random((h, w, 3)).astype(np.float32),
            tokens=rng.integers(5, 40, n_seg * tok_per_seg).astype(np.int32),
            seg_ids=np.repeat(np.arange(n_seg, dtype=np.int32), tok_per_seg),
            boxes=boxes,
            seg_classes=rng.integers(0, 5, n_seg).astype(np.int32),
            texts=[f"t{i}" for i in range(n_seg)],
        )

    def test_mixed_size_batches_round_trip(self):
        from vibertgrid_tpu.data.dataset import Collator
        from vibertgrid_tpu.data.transform import ImageTransform

        rng = np.random.default_rng(123)
        coll = Collator(ImageTransform([0.5] * 3, [0.25] * 3, [256], 256, 400))
        for case in range(8):
            bs = int(rng.integers(1, 5))
            samples = [
                self._sample(
                    rng,
                    n_seg=int(rng.integers(1, 700)),
                    tok_per_seg=int(rng.integers(1, 6)),
                    h=int(rng.integers(80, 320)),
                    w=int(rng.integers(80, 320)),
                )
                for _ in range(bs)
            ]
            train = case % 2 == 0
            batch, aux = coll(samples, train=train, rng=np.random.default_rng(0))
            assert batch.tokens.shape[1] % 510 == 0
            for i, s in enumerate(samples):
                nt, ns = len(s.tokens), len(s.seg_classes)
                assert int(batch.token_mask[i].sum()) == nt, (case, i)
                np.testing.assert_array_equal(batch.tokens[i, :nt], s.tokens)
                np.testing.assert_array_equal(batch.seg_ids[i, :nt], s.seg_ids)
                assert not batch.token_mask[i, nt:].any()
                assert int(batch.box_mask[i].sum()) == ns
                np.testing.assert_array_equal(
                    batch.seg_classes[i, :ns], s.seg_classes
                )
                assert not batch.box_mask[i, ns:].any()
                # boxes stay inside the padded image canvas
                bx = np.asarray(batch.boxes[i, :ns])
                assert (bx[:, 0] <= bx[:, 2]).all() and (bx[:, 1] <= bx[:, 3]).all()
                assert bx.min() >= 0
                assert bx[:, 2].max() <= batch.images.shape[2]
                assert bx[:, 3].max() <= batch.images.shape[1]


def test_dataset_fast_batched_encode_matches_slow(tmp_path):
    """KIEDataset's one-batched-encode-per-document fast path produces the
    identical Sample (tokens/seg_ids/boxes/classes/texts) as the reference
    per-segment tokenize+convert path."""
    from vibertgrid_tpu.data import KIEDataset
    from vibertgrid_tpu.data.synthetic import make_synthetic_root, write_vocab
    from vibertgrid_tpu.train.driver import build_tokenizer

    root = str(tmp_path / "data")
    make_synthetic_root(root, n_train=4, n_test=2, seed=2)
    vocab = write_vocab(str(tmp_path))
    spec = synthetic_spec()
    hyp = {"tokenizer_path": vocab, "bert_version": "bert-base-uncased"}
    ds_fast = KIEDataset(
        f"{root}/train", spec, build_tokenizer(hyp), train=True
    )
    ds_slow = KIEDataset(
        f"{root}/train", spec,
        build_tokenizer(dict(hyp, fast_tokenizer=False)), train=True,
    )
    assert getattr(ds_fast.tokenizer, "is_fast", False)
    assert not getattr(ds_slow.tokenizer, "is_fast", False)
    for i in range(len(ds_fast)):
        a, b = ds_fast[i], ds_slow[i]
        np.testing.assert_array_equal(a.tokens, b.tokens)
        np.testing.assert_array_equal(a.seg_ids, b.seg_ids)
        np.testing.assert_array_equal(a.boxes, b.boxes)
        np.testing.assert_array_equal(a.seg_classes, b.seg_classes)
        assert a.texts == b.texts
