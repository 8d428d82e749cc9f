"""Ground the A100 baseline: measure the reference's HOST-BOUND loops.

VERDICT r3 weak #3 / ask #3: ``bench.py``'s old denominator assumed the
eager-PyTorch reference runs at 0.35 MFU end-to-end. That contradicts the
reference's own structure (SURVEY §3.3): its forward contains three
device-independent Python hot loops that no GPU can accelerate:

  1. per-window BERT loop framing           BERTgrid_generator.py:99-146
  2. token→segment aggregation loop         BERTgrid_generator.py:148-191
     (one ``.int().item()`` per token — on CUDA each is a device sync)
  3. per-segment BERTgrid scatter loop      BERTgrid_generator.py:220-245
     (one slice-assign kernel launch per segment)

This tool IMPORTS the live reference module (no code copied) and times
loops 2 and 3 with the installed CPU torch at bench shapes (bs16, one
510-token window, 128 segments/doc, 512x384 image -> 64x48 grid @ stride 8).
The BERT encoder itself is stubbed with a zero-filled output so the
measurement isolates the host loops — on an A100 the encoder matmuls run
on-device and overlap nothing (the loops synchronize every token).

The CPU-torch measurement is a LOWER bound for the A100-hosted cost: the
``.item()`` per token forces a CUDA stream sync (~5-10 us floor each) and
every slice-assign is a kernel launch (~8 us floor), costs that do not
exist in the CPU-tensor run. Using the lower bound makes the derived
baseline FASTER, i.e. conservative against our ratio.

Output: one JSON line with per-doc host seconds, to be combined in
BASELINE.md / bench.py with the 0.35-MFU device-bound component:

    baseline_docs_per_sec = 1 / (host_s_per_doc + flops_per_doc / (312e12 * 0.35))
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/reference")

import torch

B, T, S = 16, 510, 128
H, W, STRIDE = 512, 384, 8
REPEATS = 5


class _StubEncoder(torch.nn.Module):
    """Stands in for the HF BertModel: returns zeros of the right shape
    instantly, so the timed region is the reference's host loops only."""

    class _Out:
        def __init__(self, x):
            self.last_hidden_state = x

    def forward(self, input_ids=None, attention_mask=None):
        return self._Out(
            torch.zeros(
                (input_ids.shape[0], input_ids.shape[1], 768),
                dtype=torch.float32,
            )
        )


def main():
    from model.BERTgrid_generator import BERTgridGenerator

    gen = BERTgridGenerator(bert_model=_StubEncoder(), grid_mode="mean", stride=STRIDE)

    g = torch.Generator().manual_seed(0)
    corpus = torch.randint(1000, 2000, (B, T), generator=g)
    mask = torch.ones((B, T), dtype=torch.long)
    # ~T/S tokens per segment, contiguous runs 0..S-1 (the bench-shape doc)
    seg = torch.arange(T) * S // T
    seg_indices = seg[None].expand(B, T).contiguous()

    # aggregation-loop timing (BERT_embedding with the stub encoder):
    # window framing + the per-token Python loop with .int().item() syncs
    t = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        emb = gen.BERT_embedding(corpus, mask, seg_indices)
        t.append(time.perf_counter() - t0)
    agg_s = min(t)

    # scatter-loop timing (BERTgrid_embedding): one slice-assign per segment
    boxes = []
    for _ in range(B):
        x0 = torch.randint(0, W - 64, (S, 1), generator=g)
        y0 = torch.randint(0, H - 16, (S, 1), generator=g)
        boxes.append(
            torch.cat([x0, y0, x0 + 48, y0 + 12], dim=1).float()
        )
    t = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        grid = gen.BERTgrid_embedding((H, W), emb, tuple(boxes))
        t.append(time.perf_counter() - t0)
    scatter_s = min(t)
    assert grid.shape == (B, 768, H // STRIDE, W // STRIDE)

    out = {
        "metric": "reference host-loop seconds per document (CPU torch, lower bound for A100)",
        "bs": B,
        "tokens": T,
        "segments": S,
        "aggregation_s_per_doc": round(agg_s / B, 6),
        "scatter_s_per_doc": round(scatter_s / B, 6),
        "host_s_per_doc": round((agg_s + scatter_s) / B, 6),
        "item_syncs_per_doc": T,  # each would be a CUDA sync on A100
        "kernel_launches_per_doc": S,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
