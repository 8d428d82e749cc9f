"""Host data-pipeline throughput: can the loader feed the training chip?

Measures docs/s through KIEDataset → Collator (tokenize, resize, bucket,
pad) with slow/fast tokenizers × 0/2/4 workers, on synthetic data sized
like SROIE receipts. The chip consumes ~158 docs/s training (101.5 ms at
bs 16); the loader must exceed that (prefetch_to_device overlaps the rest).

Measured in this 1-CPU-core sandbox: 83 → 152 docs/s via (a) the fast
(Rust) tokenizer with one batched GIL-releasing encode per document and
(b) resize+normalize written directly into the padded batch canvas
(bilinear_resize_norm_strided_f32 — the pad copy disappears). Thread
workers cannot scale on one core; on a real multi-core TPU-VM host the
GIL-free tokenize/resize paths parallelise across workers.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from vibertgrid_tpu.data import KIEDataset, data_loader
    from vibertgrid_tpu.data.dataset import Collator
    from vibertgrid_tpu.data.transform import ImageTransform
    from vibertgrid_tpu.data.synthetic import (
        make_synthetic_root,
        synthetic_spec,
    )

    with tempfile.TemporaryDirectory() as td:
        root = os.path.join(td, "data")
        # SROIE-like density: ~12 segments x 2-5 words per class run
        make_synthetic_root(
            root, n_train=64, n_test=2, seed=0,
            words_range=(2, 5), segs_range=(10, 14),
        )
        spec = synthetic_spec()
        transform = ImageTransform(
            [0.9] * 3, [0.2] * 3, [512], 512, 800
        )
        collator = Collator(transform)

        from vibertgrid_tpu.data.synthetic import write_vocab
        from vibertgrid_tpu.train.driver import build_tokenizer

        vocab = write_vocab(td)
        for fast in (False, True):
            tokenizer = build_tokenizer(
                {"tokenizer_path": vocab, "bert_version": "bert-base-uncased",
                 "fast_tokenizer": fast}
            )
            ds = KIEDataset(
                os.path.join(root, "train"), spec, tokenizer, train=True
            )
            for workers in (0, 2, 4):
                n = 0
                t0 = time.perf_counter()
                for epoch in range(3):
                    for batch, _aux in data_loader(
                        ds, collator, batch_size=8, train=True, seed=epoch,
                        num_workers=workers,
                    ):
                        n += int(batch.images.shape[0])
                dt = time.perf_counter() - t0
                label = "fast" if fast else "slow"
                print(
                    f"tokenizer={label} num_workers={workers}: "
                    f"{n / dt:7.1f} docs/s host pipeline"
                )


if __name__ == "__main__":
    main()
