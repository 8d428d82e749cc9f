"""End-to-end serving latency: OCR parse → tokenize → collate → jitted
forward → entity join, single document per request (the deployment path,
``serve/engine.py``), flagship SROIE model on the real chip.

Unlike bench.py (pure device throughput) this includes the host side:
tokenization, bucketed collation, H2D, device forward, D2H, join + filters.
The reference's deployment prints ~100-200 ms/doc on datacenter GPUs
(SURVEY §6) for the same stage span. Through the tunneled sandbox chip the
numbers are transfer-bound, not compute-bound: host→device moves ~77 MB/s
and each fetch costs ~29 ms (tools/mxu_calib.py), so a bs-16 image batch
pays ~350 ms of upload alone. On a local TPU host (PCIe, GB/s) the device
leg is ~7 ms/doc single-stream and the micro-batched path
(`predict_many` / serve.batching) multiplies throughput up to the chip's
~570 docs/s saturation point.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from vibertgrid_tpu.data.synthetic import make_test_tokenizer
    from vibertgrid_tpu.serve.engine import InferenceEngine

    rng = np.random.default_rng(0)
    hyp = {
        "num_classes": 5,
        "bert_version": "bert-base-uncased",
        "backbone": "resnet_34_fpn",
        "classifier_mode": "simp",
        "amp": True,
        "image_min_size": [512],
        "test_image_min_size": 512,
        "image_max_size": 800,
        "image_mean": [0.94, 0.94, 0.94],
        "image_std": [0.19, 0.19, 0.19],
    }
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        # engine needs a tokenizer; use the offline test vocab
        tokenizer = make_test_tokenizer(td)
        engine = InferenceEngine(hyp, dataset="sroie", tokenizer=tokenizer)

        # one "receipt": 48 text segments over a 768×576 page
        image = rng.random((768, 576, 3)).astype(np.float32)
        texts, boxes = [], []
        words = ["total", "date", "company", "address", "lorem", "ipsum",
                 "12.50", "2021-03-04", "ltd", "street"]
        for i in range(48):
            x0 = int(rng.integers(0, 500))
            y0 = int(rng.integers(0, 740))
            texts.append(" ".join(rng.choice(words, rng.integers(1, 4))))
            boxes.append([x0, y0, x0 + int(rng.integers(30, 76)),
                          y0 + int(rng.integers(10, 25))])

        # warm: compile the bucket signature
        engine.predict(image, texts, boxes)

        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = engine.predict(image, texts, boxes)
        dt = (time.perf_counter() - t0) / n
        print(f"end-to-end serve latency: {dt * 1e3:.1f} ms/doc "
              f"({1 / dt:.1f} docs/s single-stream)  fields={list(out)}")

        # micro-batched path (serve/batching.py feeds predict_many)
        for bs in (8, 16):
            reqs = [(image, texts, boxes)] * bs
            engine.predict_many(reqs)  # warm the bucket signature
            t0 = time.perf_counter()
            for _ in range(5):
                engine.predict_many(reqs)
            dt = (time.perf_counter() - t0) / 5
            print(f"predict_many bs{bs:2d}: {dt * 1e3:7.1f} ms/batch "
                  f"({bs / dt:.1f} docs/s)")

        # Pipelined path: batch k+1's collate+upload+dispatch overlaps batch
        # k's device compute + fetch (engine.predict_stream, depth 2). On an
        # upload-bound link this is the lever — the chip works while bytes
        # move (VERDICT r4 ask #4).
        stream_reqs = [(image, texts, boxes)] * 80
        engine.predict_stream(stream_reqs[:32], batch_size=16)  # warm
        t0 = time.perf_counter()
        engine.predict_stream(stream_reqs, batch_size=16, depth=2)
        dt = time.perf_counter() - t0
        print(f"predict_stream bs16 depth2: {len(stream_reqs) / dt:.1f} docs/s "
              f"({dt / len(stream_reqs) * 1e3:.1f} ms/doc over "
              f"{len(stream_reqs)} docs)")

        # Decomposition: host collate / H2D upload / device forward+fetch.
        # Through the sandbox tunnel the link (~77 MB/s up, ~29 ms/fetch)
        # dominates; on a local TPU host (PCIe) the upload leg shrinks by
        # >100× and the device leg is the bound.
        samples = [engine._make_sample(image, texts, np.asarray(boxes))
                   for _ in range(16)]
        t0 = time.perf_counter()
        batch, aux = engine.collator(samples, train=False)
        t_collate = time.perf_counter() - t0
        sizes = np.asarray(aux.image_sizes, np.int32)
        nbytes = sum(
            a.nbytes for a in jax.tree_util.tree_leaves(batch)
        ) + sizes.nbytes
        jax.device_put((batch, sizes))[0].images.block_until_ready()
        t0 = time.perf_counter()
        dev_batch, dev_sizes = jax.device_put((batch, sizes))
        jax.device_get(dev_batch.images[0, 0, 0, 0])  # tunnel: fetch=sync
        t_upload = time.perf_counter() - t0
        variables = engine._variables()
        engine._infer(variables, dev_batch, dev_sizes)  # warm
        t0 = time.perf_counter()
        for _ in range(5):
            np.asarray(engine._infer(variables, dev_batch, dev_sizes))
        t_fwd = (time.perf_counter() - t0) / 5
        print(
            f"decomposition bs16 ({'uint8' if engine.uint8_upload else 'fp32'}"
            f" wire, {nbytes / 1e6:.1f} MB): collate {t_collate * 1e3:.1f} ms"
            f"  upload {t_upload * 1e3:.1f} ms"
            f"  device fwd+fetch {t_fwd * 1e3:.1f} ms"
        )


if __name__ == "__main__":
    main()
