"""Host data-pipeline throughput: can the loader feed the 57.7 ms/step chip?

Measures docs/s through KIEDataset → Collator (tokenize, resize, bucket,
pad) with 0/2/4 workers, on synthetic data sized like SROIE receipts.
The device consumes bs 8 / 57.7 ms ≈ 139 docs/s; the loader must exceed
that (with prefetch_to_device overlapping the remainder).
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
        make_test_tokenizer,
        synthetic_spec,
    )

    with tempfile.TemporaryDirectory() as td:
        root = os.path.join(td, "data")
        make_synthetic_root(root, n_train=64, n_test=2, seed=0)
        spec = synthetic_spec()
        tokenizer = make_test_tokenizer(td)
        ds = KIEDataset(os.path.join(root, "train"), spec, tokenizer, train=True)
        transform = ImageTransform(
            [0.9] * 3, [0.2] * 3, [512], 512, 800
        )
        collator = Collator(transform)

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
            print(f"num_workers={workers}: {n / dt:7.1f} docs/s host pipeline")


if __name__ == "__main__":
    main()
