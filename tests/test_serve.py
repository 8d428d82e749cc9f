"""Serving layer tests: engine predict + HTTP round trip (stdlib server)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from vibertgrid_tpu.data.synthetic import (
    make_synthetic_root,
    make_test_tokenizer,
    synthetic_spec,
)
from vibertgrid_tpu.serve.app import _extract_multipart, serve
from vibertgrid_tpu.serve.engine import InferenceEngine
from vibertgrid_tpu.serve.ocr_client import parse_ocr_result


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    make_synthetic_root(root, n_train=2, n_test=1)
    tokenizer = make_test_tokenizer(root)
    hyp = {
        "num_classes": 5,
        "bert_version": "tiny-bert-test",
        "backbone": "resnet_18_fpn",
        "classifier_mode": "simp",
        "layer_mode": "single",
        "image_min_size": [256],
        "test_image_min_size": 256,
        "image_max_size": 400,
        "image_mean": [0.9] * 3,
        "image_std": [0.15] * 3,
        "tag_mode": "B",
    }
    return InferenceEngine(hyp, tokenizer=tokenizer, spec=synthetic_spec())


def test_engine_predict(engine):
    image = np.full((200, 160, 3), 0.95, np.float32)
    texts = ["company corp", "total", "12.50"]
    boxes = [[10, 10, 90, 24], [10, 40, 50, 54], [60, 40, 100, 54]]
    result = engine.predict(image, texts, boxes)
    assert set(result) == {"company", "date", "address", "total"}
    assert all(isinstance(v, str) for v in result.values())


def test_engine_empty_ocr(engine):
    image = np.full((200, 160, 3), 0.95, np.float32)
    result = engine.predict(image, [], np.zeros((0, 4), np.int32))
    assert all(v == "" for v in result.values())


def test_parse_ocr_modes():
    api = {
        "code": 200,
        "result": {
            "lines": [
                {
                    "text": "ab cd",
                    "position": [0, 0, 50, 0, 50, 12, 0, 12],
                    "char_positions": [
                        [i * 10, 0, i * 10 + 9, 0, i * 10 + 9, 12, i * 10, 12]
                        for i in range(5)
                    ],
                }
            ]
        },
    }
    code, texts, coors = parse_ocr_result(api, "eng_line")
    assert code == 200 and texts == ["ab cd"] and coors == [[0, 0, 50, 12]]
    code, texts, coors = parse_ocr_result(api, "eng_word")
    assert texts == ["ab", "cd"]
    code, texts, coors = parse_ocr_result(api, "chn_char")
    assert len(texts) == 5
    code, texts, coors = parse_ocr_result({"code": -1}, "eng_line")
    assert code == -1 and texts == []


def test_multipart_extraction():
    boundary = "xyz"
    content = b"IMAGE_BYTES_HERE"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="file"; filename="a.jpg"\r\n'
        f"Content-Type: image/jpeg\r\n\r\n"
    ).encode() + content + f"\r\n--{boundary}--\r\n".encode()
    out = _extract_multipart(body, f'multipart/form-data; boundary="{boundary}"')
    assert out == content


class _StubEngine:
    def predict_bytes(self, image_bytes):
        return {"company": "ACME", "n_bytes": len(image_bytes)}


def test_http_round_trip():
    port = 18454
    t = threading.Thread(
        target=serve, args=(_StubEngine(),), kwargs={"port": port}, daemon=True
    )
    t.start()
    import time

    deadline = time.time() + 10
    payload = b"--bnd\r\nContent-Disposition: form-data; name=\"file\"; filename=\"x\"\r\n\r\nBYTES\r\n--bnd--\r\n"
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/core",
        data=payload,
        headers={"Content-Type": 'multipart/form-data; boundary="bnd"'},
    )
    while True:
        try:
            with urllib.request.urlopen(req, timeout=2) as r:
                out = json.loads(r.read())
            break
        except Exception:
            if time.time() > deadline:
                raise
            time.sleep(0.2)
    assert out["result"]["company"] == "ACME"
    assert out["result"]["n_bytes"] == len(b"BYTES")


def test_predict_many_matches_single(engine):
    image = np.full((200, 160, 3), 0.95, np.float32)
    reqs = [
        (image, ["company corp", "total"], [[10, 10, 90, 24], [10, 40, 50, 54]]),
        (image, [], []),  # empty OCR → empty result in place
        (image, ["date 2021"], [[20, 60, 80, 74]]),
    ]
    batched = engine.predict_many(reqs)
    singles = [engine.predict(*r) for r in reqs]
    assert batched == singles
    assert batched[1] == {c: "" for c in engine.spec.class_list[1:]}


def test_batching_engine_concurrent(engine):
    from vibertgrid_tpu.serve.batching import BatchingEngine

    be = BatchingEngine(engine, max_batch=4, max_wait_ms=20)
    try:
        image = np.full((200, 160, 3), 0.95, np.float32)
        reqs = [
            (image, [f"text {i}", "total"], [[10, 10, 90, 24], [10, 40, 50, 54]])
            for i in range(6)
        ]
        want = [engine.predict(*r) for r in reqs]
        results = [None] * len(reqs)

        def call(i):
            results[i] = be.predict(*reqs[i])

        threads = [threading.Thread(target=call, args=(i,)) for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert results == want
    finally:
        be.close()


def test_uint8_upload_matches_fp32(tmp_path_factory):
    """The uint8 wire format (4× fewer H2D bytes + in-graph normalize +
    padding re-zeroed, engine.py) must produce the same extracted fields
    and near-identical probabilities as the exact fp32 eval path."""
    root = str(tmp_path_factory.mktemp("synth_u8"))
    make_synthetic_root(root, n_train=2, n_test=1)
    tokenizer = make_test_tokenizer(root)
    hyp = {
        "num_classes": 5,
        "bert_version": "tiny-bert-test",
        "backbone": "resnet_18_fpn",
        "classifier_mode": "simp",
        "layer_mode": "single",
        "image_min_size": [256],
        "test_image_min_size": 256,
        "image_max_size": 400,
        "image_mean": [0.9] * 3,
        "image_std": [0.15] * 3,
        "tag_mode": "B",
    }
    eng_u8 = InferenceEngine(
        dict(hyp, serve_uint8_upload=True),
        tokenizer=tokenizer,
        spec=synthetic_spec(),
    )
    eng_f32 = InferenceEngine(
        dict(hyp, serve_uint8_upload=False),
        tokenizer=tokenizer,
        spec=synthetic_spec(),
    )
    # identical random init (seed=0 in both constructors)
    import jax

    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: bool((a == b).all()),
            eng_u8.state.params,
            eng_f32.state.params,
        )
    )
    assert chex_equal

    rng = np.random.default_rng(3)
    image = rng.random((220, 170, 3)).astype(np.float32)
    texts = ["company corp", "total", "12.50", "main street"]
    boxes = [
        [10, 10, 90, 24],
        [10, 40, 50, 54],
        [60, 40, 100, 54],
        [10, 80, 120, 94],
    ]

    # Compare the raw per-segment probabilities with a tolerance first: the
    # ≤0.5/255 wire quantization legitimately perturbs the logits a little,
    # and a borderline argmax flip would otherwise make exact field equality
    # flaky rather than diagnostic (ADVICE r4 #4). A real wire bug (wrong
    # normalization, padding not re-zeroed) produces O(1) deltas.
    def _probs(eng):
        sample = eng._make_sample(image, texts, np.asarray(boxes))
        batch, aux = eng.collator([sample], train=False)
        sizes = np.asarray(aux.image_sizes, np.int32)
        logits = np.asarray(
            eng._infer(eng._variables(), batch, sizes), np.float32
        )[0, : aux.n_segments[0]]
        z = logits - logits.max(-1, keepdims=True)
        return np.exp(z) / np.exp(z).sum(-1, keepdims=True)

    p_u8, p_f32 = _probs(eng_u8), _probs(eng_f32)
    delta = float(np.abs(p_u8 - p_f32).max())
    assert delta < 0.05, f"uint8 wire perturbs probabilities by {delta}"

    # Field equality is only asserted when every segment's top-2 margin
    # exceeds the measured quantization perturbation — i.e. no argmax can
    # have flipped for a legitimate reason.
    top2 = np.sort(p_f32, axis=-1)[:, -2:]
    margin = float((top2[:, 1] - top2[:, 0]).min())
    if margin > 2 * delta:
        r_u8 = eng_u8.predict(image, texts, boxes)
        r_f32 = eng_f32.predict(image, texts, boxes)
        assert r_u8 == r_f32


def test_predict_stream_matches_predict_many(engine):
    """The pipelined path (dispatch k+1 before fetching k) returns exactly
    the per-request results of the serial micro-batched path, including
    empty-OCR rows interleaved at any position."""
    rng = np.random.default_rng(7)
    reqs = []
    for i in range(5):
        image = np.full((200, 160, 3), 0.95, np.float32)
        image[20:60, 10:100] = rng.uniform(0.2, 0.8)
        if i == 2:  # empty-OCR request mid-stream
            reqs.append((image, [], np.zeros((0, 4), np.int32)))
        else:
            reqs.append(
                (
                    image,
                    ["company corp", "total", f"{i}2.50"],
                    [[10, 10, 90, 24], [10, 40, 50, 54], [60, 40, 100, 54]],
                )
            )
    serial = []
    for i in range(0, len(reqs), 2):
        serial.extend(engine.predict_many(reqs[i : i + 2]))
    streamed = engine.predict_stream(reqs, batch_size=2, depth=2)
    assert streamed == serial
