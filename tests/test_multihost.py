"""Multi-host evaluation wiring (VERDICT r1 #6).

Proves — with two REAL processes joined via ``jax.distributed.initialize``
on localhost (CPU/gloo) — that per-process loader shards produce the same
global metrics as a single process, via the harness's cross-process gather
(the reference's ``all_reduce`` + ``all_gather_object``,
``pipeline/train_val_utils.py:537-552``).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _fixture_docs():
    """Deterministic 4-document fake prediction fixture."""
    rng = np.random.default_rng(7)
    docs = []
    for i in range(4):
        n = 5 + i
        probs = np.eye(5, dtype=np.float32)[rng.integers(0, 5, n)]
        gt = rng.integers(0, 5, n)
        docs.append((probs, gt))
    return docs


def _validate_over(docs, tag_to_idx):
    from types import SimpleNamespace

    from vibertgrid_tpu.data.dataset import EvalAux
    from vibertgrid_tpu.data.spec import SROIE_SPEC
    from vibertgrid_tpu.eval.harness import validate

    items = []
    for di, (probs, gt) in enumerate(docs):
        out = SimpleNamespace(
            total_loss=None, pred_label=probs[None], gt_label=gt[None]
        )
        aux = EvalAux(
            texts=[[f"t{j}" for j in range(len(gt))]],
            key_dicts=[{"filename": f"doc{di}"}],
            n_segments=[len(gt)],
        )
        items.append((out, aux))
    return validate(
        lambda state, batch: batch,  # the "batch" IS the fake model output
        None,
        items,
        SROIE_SPEC,
        eval_mode="seqeval",
        tag_to_idx=tag_to_idx,
        verbose=False,
    )


WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    sys.path.insert(0, "__REPO__")
    from tests.test_multihost import _fixture_docs, _validate_over
    from vibertgrid_tpu.data.spec import SROIE_SPEC

    docs = _fixture_docs()
    # each process evaluates its loader shard (data_loader shard=(rank, world))
    shard = docs[pid::2]
    res = _validate_over(shard, SROIE_SPEC.tag_to_idx("B"))
    print("RESULT" + json.dumps(
        {k: res[k] for k in ("token_F1", "token_accuracy", "primary_F1")}
    ))
    """
).replace("__REPO__", REPO)


def test_two_process_shards_match_global_metrics(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # default device count; gloo handles comms
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    # single-process global reference
    from vibertgrid_tpu.data.spec import SROIE_SPEC

    ref = _validate_over(_fixture_docs(), SROIE_SPEC.tag_to_idx("B"))
    for o in outs:
        line = [ln for ln in o.splitlines() if ln.startswith("RESULT")][0]
        got = json.loads(line[len("RESULT"):])
        assert got["token_F1"] == pytest.approx(ref["token_F1"])
        assert got["token_accuracy"] == pytest.approx(ref["token_accuracy"])


def test_allgather_bytes_single_process_identity():
    from vibertgrid_tpu.parallel.mesh import (
        process_allgather_bytes,
        process_allgather_objects,
    )

    assert process_allgather_bytes(b"abc") == [b"abc"]
    assert process_allgather_objects({"x": 1}) == [{"x": 1}]


def test_loader_shards_cover_dataset_disjointly(tmp_path):
    from vibertgrid_tpu.data import Collator, ImageTransform, KIEDataset, data_loader
    from vibertgrid_tpu.data.synthetic import (
        make_synthetic_root,
        make_test_tokenizer,
        synthetic_spec,
    )

    root = str(tmp_path / "d")
    make_synthetic_root(root, n_train=6, n_test=2, seed=1)
    tokenizer = make_test_tokenizer(root)
    spec = synthetic_spec()
    ds = KIEDataset(f"{root}/train", spec, tokenizer, train=True)
    tr = ImageTransform(spec.image_mean, spec.image_std, [256], 256, 400)
    coll = Collator(tr)

    seen = []
    for rank in range(2):
        for batch, aux in data_loader(
            ds, coll, batch_size=1, train=True, seed=3,
            shard=(rank, 2), drop_last=False,
        ):
            seen.append(tuple(aux.texts[0]))
    assert len(seen) == 6 and len(set(seen)) == 6, "shards overlap or drop"
