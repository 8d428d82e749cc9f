"""Micro-batching wrapper for the inference engine.

The reference serves strictly one document per forward through Flask
(``deployment/main_SROIE.py:19-33``). Under concurrent load that leaves the
chip mostly idle between requests; the flagship forward saturates only
around batch 16 (tools/batch_sweep.py). :class:`BatchingEngine` runs a
background worker that drains a request queue into one
``InferenceEngine.predict_many`` call — up to ``max_batch`` requests or
whatever arrived within ``max_wait_ms`` of the first — so concurrent
callers share device batches transparently while a lone request pays at
most ``max_wait_ms`` extra latency.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future


class BatchingEngine:
    def __init__(self, engine, max_batch: int = 8, max_wait_ms: float = 5.0):
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def predict(self, image, texts, boxes) -> dict:
        """Blocking single-request API; batching happens transparently."""
        fut: Future = Future()
        self._queue.put(((image, texts, boxes), fut))
        return fut.result()

    def predict_bytes(self, image_bytes: bytes):
        """OCR + batched model call (engine.predict_bytes equivalent)."""
        import io

        import numpy as np
        from PIL import Image

        from vibertgrid_tpu.serve.ocr_client import ocr_extraction

        code, texts, boxes = ocr_extraction(
            image_bytes, self.engine.ocr_url, self.engine.parse_mode
        )
        if code != 200:
            return None
        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        image = np.asarray(img, np.float32) / 255.0
        return self.predict(image, texts, boxes)

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)

    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            items = [first]
            # drain whatever arrives within the wait window, up to max_batch
            deadline = self.max_wait
            while len(items) < self.max_batch:
                try:
                    items.append(self._queue.get(timeout=deadline))
                except queue.Empty:
                    break
            requests = [req for req, _ in items]
            try:
                results = self.engine.predict_many(requests)
                for (_, fut), res in zip(items, results):
                    fut.set_result(res)
            except Exception as e:  # pragma: no cover - propagate to callers
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
