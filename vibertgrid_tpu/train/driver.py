"""The single training driver.

Replaces the reference's three copy-paste train CLIs (``train_SROIE.py``,
``train_EPHOIE.py``, ``train_FUNSD.py`` — identical modulo the dataset spec,
SURVEY.md §1) with one parameterized driver:

    python -m vibertgrid_tpu.train.driver --config cfg.yaml --dataset sroie

The YAML schema is reference-compatible (``example_config.yaml``): optimizer
blocks, OHEM counts, classifier/eval/tag modes, backbone + bert versions,
dataset stats/sizes, save dirs, resume weights. Additional keys:
``tokenizer_path`` (local tokenizer, no network), ``mesh_data``/``mesh_model``
(device mesh shape).

Flow mirrors ``train_SROIE.py:51-423``: seed → tokenizer → loaders → model →
dual optimizer + schedules → optional resume → initial validate → epoch loop
(train_one_epoch, validate, top-F1 checkpointing) — with the whole step
jitted and the batch sharded over the mesh instead of DDP.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Any

import numpy as np
import yaml

import jax

from vibertgrid_tpu.data import (
    Collator,
    ImageTransform,
    KIEDataset,
    bucketed_eval_loader,
    data_loader,
    get_spec,
    prefetch_to_device,
)
from vibertgrid_tpu.eval.harness import validate
from vibertgrid_tpu.models import ModelConfig, ViBERTgridNet
from vibertgrid_tpu.parallel import make_mesh, replicate, shard_batch
from vibertgrid_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from vibertgrid_tpu.train.checkpoint import CheckpointManager
from vibertgrid_tpu.utils.logging import MetricsLogger, TerminalLogger, setup_seed


def build_tokenizer(hyp: dict):
    """Local tokenizer only (no hub). ``tokenizer_path`` points at a dir with
    vocab/tokenizer files; falls back to bert_version as a local path.

    Defaults to the Rust-backed fast tokenizers (GIL-free — segment
    tokenization is the host pipeline's serial bottleneck, and fast releases
    it so ``num_workers`` parallelises tokenization too). ``fast_tokenizer:
    false`` restores the reference's slow Python tokenizers
    (train_SROIE.py:147-150); outputs are parity-tested.
    """
    from transformers import (
        BertTokenizer,
        BertTokenizerFast,
        RobertaTokenizer,
        RobertaTokenizerFast,
    )

    fast = hyp.get("fast_tokenizer", True)
    path = hyp.get("tokenizer_path") or hyp["bert_version"]
    if "roberta" in hyp["bert_version"]:
        cls = RobertaTokenizerFast if fast else RobertaTokenizer
        return cls.from_pretrained(path)
    if os.path.isfile(path):  # bare vocab.txt
        if fast:
            return BertTokenizerFast(vocab_file=path)
        return BertTokenizer(path)
    cls = BertTokenizerFast if fast else BertTokenizer
    return cls.from_pretrained(path)


def build_all(hyp: dict, dataset: str, tokenizer=None, spec=None, mesh=None):
    """Construct (spec, model, optimizer fn pieces, transform, collator).

    ``mesh``: a multi-device ("data", "model") mesh to thread into the
    encoder so the fused attention kernel runs per-shard (shard_map) instead
    of falling back to the einsum path — see ``flash_attention_sharded``.
    """
    spec = spec or get_spec(dataset)
    tag_mode = hyp.get("tag_mode", "B")
    tag_to_idx = spec.tag_to_idx(tag_mode)
    model_cfg_dict = dict(hyp)
    model_cfg_dict["num_classes"] = hyp.get("num_classes", spec.num_classes)
    if hyp.get("classifier_mode") == "crf" or tag_mode == "BIO":
        model_cfg_dict["tag_to_idx"] = tag_to_idx
    cfg = ModelConfig.from_yaml_dict(model_cfg_dict)
    if mesh is not None and mesh.devices.size > 1:
        cfg = __import__("dataclasses").replace(cfg, mesh=mesh)
    if tokenizer is not None:
        # RoBERTa's <s> id is 0 (falsy!) — `or 101` would silently frame
        # every RoBERTa window with BERT's [CLS]. Explicit None checks only.
        cls_id = tokenizer.cls_token_id
        sep_id = tokenizer.sep_token_id
        cfg = __import__("dataclasses").replace(
            cfg,
            cls_token_id=cls_id if cls_id is not None else 101,
            sep_token_id=sep_id if sep_id is not None else 102,
        )
    model = ViBERTgridNet(cfg)
    transform = ImageTransform(
        hyp.get("image_mean", spec.image_mean),
        hyp.get("image_std", spec.image_std),
        hyp.get("image_min_size", [320, 416, 512, 608, 704]),
        hyp.get("test_image_min_size", 512),
        hyp.get("image_max_size", 800),
    )
    collator = Collator(transform)
    return spec, cfg, model, transform, collator, tag_to_idx


def _load_torch_state_dict(path: str) -> dict:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return sd.get("model", sd) if isinstance(sd, dict) else sd


def load_pretrained_into_state(state, hyp: dict, cfg):
    """Splice local HF BERT / torchvision ResNet weights into a TrainState.

    ``reference_weights``: a trained ViBERTgrid-PyTorch checkpoint (.pt/.pth
    — the full model ``state_dict``); converts every component via
    ``models.load_reference_checkpoint`` (migration path for reference
    users)."""
    params = state.params
    batch_stats = state.batch_stats
    if hyp.get("reference_weights"):
        from vibertgrid_tpu.models import load_reference_checkpoint

        variables = load_reference_checkpoint(
            {"params": params, "batch_stats": batch_stats},
            _load_torch_state_dict(hyp["reference_weights"]),
        )
        params, batch_stats = variables["params"], variables["batch_stats"]
        print("==> loaded reference (ViBERTgrid-PyTorch) checkpoint")
    if hyp.get("bert_weights"):
        from vibertgrid_tpu.models.bert import load_hf_weights

        text_cfg = cfg.resolved_text_config()
        bert_params = load_hf_weights(
            params["bert_model"],
            _load_torch_state_dict(hyp["bert_weights"]),
            text_cfg.num_layers,
        )
        params = dict(params, bert_model=bert_params)
        print("==> loaded local BERT weights")
    if hyp.get("backbone_weights"):
        from vibertgrid_tpu.models.resnet_fpn import load_pretrained_backbone

        variables = load_pretrained_backbone(
            {"params": params, "batch_stats": batch_stats},
            _load_torch_state_dict(hyp["backbone_weights"]),
            cfg.backbone,
        )
        params, batch_stats = variables["params"], variables["batch_stats"]
        print("==> loaded local backbone weights")
    return state.replace(params=params, batch_stats=batch_stats)


def train(hyp: dict, dataset: str, spec=None, max_steps: int | None = None) -> dict:
    """Full training run; returns final metrics. ``max_steps`` truncates for
    smoke tests."""
    # Multi-host bootstrap + rank-0 print gating (the torchrun/NCCL
    # equivalents, distributed_utils.py:73-100, 57-70). No-ops single-host.
    from vibertgrid_tpu.parallel.mesh import (
        init_distributed_mode,
        setup_rank0_print,
    )

    init_distributed_mode()
    setup_rank0_print()
    proc_shard = (jax.process_index(), jax.process_count())
    setup_seed(42)
    comment = hyp.get("comment", dataset)
    save_log = hyp.get("save_log", "./log/")
    if hyp.get("tee_logs", True):
        os.makedirs(save_log, exist_ok=True)
        sys.stdout = TerminalLogger(
            os.path.join(save_log, f"train_{comment.strip()}_{int(time.time())}.log")
        )

    tokenizer = build_tokenizer(hyp)
    batch_size = hyp.get("batch_size", 2)
    model_axis = hyp.get("mesh_model", 1)
    data_axis = hyp.get("mesh_data")
    if data_axis is None:
        # largest data-parallel degree that divides the batch size
        avail = max(len(jax.devices()) // model_axis, 1)
        data_axis = next(d for d in range(min(avail, batch_size), 0, -1)
                         if batch_size % d == 0)
    mesh = make_mesh(data=data_axis, model=model_axis)
    if data_axis * model_axis > 1 and jax.default_backend() != "tpu":
        # GSPMD cannot partition a pallas_call, and on non-TPU backends (the
        # virtual CPU mesh used by tests / dryrun_multichip) the kernels
        # would have to run interpreted — and with mesh=None below the
        # encoder can't even shard_map them: multi-device CPU meshes force
        # the einsum paths, which GSPMD partitions for free.
        if hyp.get("attention_impl", "auto") != "xla":
            hyp = dict(hyp, attention_impl="xla")
        if hyp.get("ffn_impl", "auto") != "xla":
            hyp = dict(hyp, ffn_impl="xla")
        # On TPU the mesh threads into the encoder and the fused kernels run
        # per-shard under shard_map (batch on `data`, heads on `model` — the
        # same placement parallel/sharding.py gives the projection outputs);
        # the encoder falls back to einsum itself if head/batch counts don't
        # divide the axis sizes. See ops/flash_attention.flash_attention_sharded.
    spec, cfg, model, transform, collator, tag_to_idx = build_all(
        hyp, dataset, tokenizer, spec,
        mesh=mesh if jax.default_backend() == "tpu" else None,
    )
    data_root = hyp["data_root"]
    start_epoch = hyp.get("start_epoch", 0)
    end_epoch = hyp.get("end_epoch", 1)
    eval_mode = hyp.get("eval_mode", spec.default_eval_mode)
    if hyp.get("classifier_mode") == "crf":
        # The CRF head emits decoded tags, not per-class scores; only the
        # seqeval metric applies (train_SROIE.py:134-137).
        assert eval_mode == "seqeval", (
            "When using the crf classifier, only the seqeval metric is "
            "available"
        )

    train_ds = KIEDataset(
        os.path.join(data_root, "train"), spec, tokenizer, train=True
    )
    test_ds = KIEDataset(
        os.path.join(data_root, "test"), spec, tokenizer, train=False
    )

    if hyp.get("compute_dataset_stats", False):
        # The reference's return_mean_std loader option
        # (data/SROIE_dataset.py:263-278): compute per-channel image stats
        # from the train split and use them for normalization.
        from vibertgrid_tpu.data import compute_mean_std

        m, s = compute_mean_std(train_ds, num_workers=hyp.get("num_workers", 0))
        print(f"==> dataset stats: mean={m.tolist()} std={s.tolist()}")
        transform.image_mean = m.tolist()
        transform.image_std = s.tolist()

    # The train loader shards the dataset across processes
    # (shard=proc_shard), so each process takes len(ds)//world//batch_size
    # steps per epoch — size the per-iteration lr/wd schedule arrays from
    # THAT, not the global count (the DistributedSampler length semantics,
    # data/SROIE_dataset.py:314-319). batch_size is PER PROCESS; the global
    # batch is batch_size * process_count.
    world = jax.process_count()
    niter_per_ep = max(len(train_ds) // world // batch_size, 1)
    optimizer, schedules = make_optimizer(
        hyp, end_epoch, niter_per_ep, return_schedules=True
    )

    sample_batch, _ = next(
        iter(data_loader(train_ds, collator, batch_size, train=True, seed=0))
    )
    state = create_train_state(model, optimizer, sample_batch, seed=42)
    state = replicate(state, mesh)

    # ZeRO-1 (yaml `zero1: true`, beyond the reference's replicated
    # optimizers): shard Adam/SGD state over the data axis; the train step
    # pins the placement so it survives updates.
    opt_shardings = None
    if hyp.get("zero1", False) and mesh.shape["data"] > 1:
        from vibertgrid_tpu.parallel.sharding import (
            optimizer_state_shardings,
            shard_optimizer_state,
        )

        opt_shardings = optimizer_state_shardings(state.opt_state, mesh)
        state = state.replace(
            opt_state=shard_optimizer_state(state.opt_state, mesh)
        )

    # Pretrained ingestion from LOCAL checkpoints (no hub):
    # - bert_weights: HF torch state dict (.bin / .safetensors / .pt)
    # - backbone_weights: torchvision resnet state dict (.pth)
    # - reference_weights: a trained ViBERTgrid-PyTorch model state_dict
    #   (full migration, models.load_reference_checkpoint)
    if (
        hyp.get("bert_weights")
        or hyp.get("backbone_weights")
        or hyp.get("reference_weights")
    ):
        state = load_pretrained_into_state(state, hyp, cfg)

    ckpt = CheckpointManager(
        hyp.get("save_top", "./weights/"), hyp.get("top_F1_tresh", 0.0)
    )
    if hyp.get("weights"):
        state, meta = ckpt.restore(hyp["weights"], state)
        start_epoch = int(meta.get("epoch", 0)) + 1
        print(f"==> resumed from {hyp['weights']} at epoch {start_epoch}")

    train_step = make_train_step(model, optimizer, opt_state_shardings=opt_shardings)
    # eval_uint8_upload: validation uses the serving engine's uint8 wire
    # (4× fewer H2D bytes; ≤0.5/255 in-graph quantization, measured 5.71×
    # end-to-end on a bandwidth-bound link — tools/eval_bench.py). Off by
    # default: exact-fp32 validation numerics feed best-F1 checkpointing.
    if hyp.get("eval_uint8_upload", False):
        eval_collator = Collator(transform, emit_uint8=True)
        eval_step = make_eval_step(
            model,
            image_stats=(transform.image_mean, transform.image_std),
        )
    else:
        eval_collator = collator
        eval_step = make_eval_step(model)
    logger = MetricsLogger(save_log, comment)

    def run_validate():
        # Bucketed batched eval (bs-1 available via eval_batch_size: 1):
        # groups test docs by collation signature so each jitted signature
        # serves many documents and host syncs amortize per batch.
        #
        # Multi-host: eval is PROCESS-LOCAL (per-process bucket compositions
        # differ, so a global jit is impossible) — each process scores its
        # loader shard on its local mesh slice against its own replica of
        # the (fully replicated) params, and the harness all-gathers the
        # metric objects (the reference's all_gather_object pattern,
        # train_val_utils.py:544-552).
        eval_mesh, eval_state = mesh, state
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            from jax.sharding import PartitionSpec as P

            from vibertgrid_tpu.parallel.mesh import local_mesh

            eval_mesh = local_mesh(mesh)
            eval_state = state.replace(opt_state=())  # may be ZeRO-1 sharded
            eval_state = multihost_utils.global_array_to_host_local_array(
                eval_state,
                mesh,
                jax.tree_util.tree_map(lambda _: P(), eval_state),
            )
        loader = (
            (shard_batch(b, eval_mesh), aux)
            for b, aux in bucketed_eval_loader(
                test_ds,
                eval_collator,
                batch_size=hyp.get("eval_batch_size", 8),
                shard=proc_shard,
                num_workers=hyp.get("num_workers", 0),
            )
        )
        return validate(
            eval_step,
            eval_state,
            loader,
            spec,
            eval_mode=eval_mode,
            tag_to_idx=tag_to_idx,
            seqeval_average=hyp.get("seqeval_average", spec.seqeval_average),
        )

    def _learned_types(res: dict) -> int:
        return sum(1 for v in res.get("per_type_F1", {}).values() if v > 0)

    # Initial validate of the untrained model (train_SROIE.py:324-335).
    # Label it: in block-buffered logs this is otherwise indistinguishable
    # from an epoch validate (it bit a log reading on 2026-08-20).
    print(f"== validate (initial, epoch {start_epoch})")
    results = run_validate()
    best_f1 = results["primary_F1"]
    best_learned_types = _learned_types(results)

    # Per-iteration console/TB log (train_val_utils.py:293-335). Printing the
    # loss forces a device→host sync (~29 ms through the tunnel), so it is
    # opt-in via the reference's ``iter_msg`` yaml flag, with ``log_interval``
    # to stride it; lr/wd come from the host-side schedule arrays for free.
    iter_msg = hyp.get("iter_msg", False)
    log_interval = max(int(hyp.get("log_interval", 1)), 1)

    def _iter_log(epoch, it, loss_v, sched_idx, t_iter):
        idx = min(sched_idx, len(schedules["lr_cnn"]) - 1)
        mem = ""
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
            if peak is not None:
                mem = f"  max mem: {peak / 1048576:.0f}MB"
        except Exception:
            pass
        print(
            f"\t epoch[{epoch + 1}]  iter[{it}]/[{niter_per_ep}]  "
            f"train_loss: {loss_v:.4f}  "
            f"lr_cnn: {schedules['lr_cnn'][idx]:.3e}  "
            f"lr_bert: {schedules['lr_bert'][idx]:.3e}  "
            f"wd: {schedules['wd_cnn'][idx]:.3e}  "
            f"time used: {t_iter:.2f}s{mem}"
        )
        logger.update(
            head="opt",
            step=idx,
            lr_cnn=float(schedules["lr_cnn"][idx]),
            lr_bert=float(schedules["lr_bert"][idx]),
            wd_cnn=float(schedules["wd_cnn"][idx]),
            wd_bert=float(schedules["wd_bert"][idx]),
        )
        logger.update(head="loss", step=idx, iter_loss=loss_v)

    start_step = int(state.step)
    steps_done = 0
    key = jax.random.PRNGKey(hyp.get("seed", 42))
    for epoch in range(start_epoch, end_epoch):
        t_ep = time.time()
        t_iter = time.time()
        it_in_epoch = 0
        epoch_losses = []
        epoch_iter = (
            (shard_batch(b, mesh), aux)
            for b, aux in data_loader(
                train_ds,
                collator,
                batch_size,
                train=True,
                seed=epoch,
                shard=proc_shard,
                num_workers=hyp.get("num_workers", 0),
            )
        )
        # Background prefetch: decode/collation + H2D overlap the device step
        # (the reference's DataLoader(num_workers) + pin_memory equivalent).
        for batch, _aux in prefetch_to_device(epoch_iter, put=False):
            state, loss = train_step(state, batch, key)
            epoch_losses.append(loss)
            steps_done += 1
            it_in_epoch += 1
            logger.set_step()
            if iter_msg and steps_done % log_interval == 0:
                now = time.time()
                _iter_log(
                    epoch,
                    it_in_epoch,
                    float(loss),
                    start_step + steps_done - 1,
                    now - t_iter,
                )
                t_iter = now
            if max_steps and steps_done >= max_steps:
                break
        mean_loss = float(np.mean([float(l) for l in epoch_losses]))
        print(
            f"\tepoch[{epoch + 1}] train_loss: {mean_loss:.4f} "
            f"time: {time.time() - t_ep:.0f}s"
        )
        logger.update(head="loss", step=epoch + 1, train_loss=mean_loss)

        # Long convergence runs stride validation (each validate costs a
        # compile-cached forward sweep + tunnel fetches); always validate
        # the final epoch so `results` reflects the finished model.
        val_interval = max(int(hyp.get("val_epoch_interval", 1)), 1)
        stopping = bool(max_steps and steps_done >= max_steps)
        # A max_steps stop mid-stride must still validate: otherwise
        # `results` would be stale (an earlier epoch's metrics returned
        # against the final `final_state`) — ADVICE r4 #1.
        if (epoch + 1) % val_interval == 0 or epoch + 1 == end_epoch or stopping:
            print(f"== validate (epoch {epoch + 1})")
            results = run_validate()
            f1 = results["primary_F1"]
            logger.update(head="criteria", step=epoch + 1, label_F1=f1)
            best_f1 = max(best_f1, f1)
            best_learned_types = max(
                best_learned_types, _learned_types(results)
            )
            saved = ckpt.maybe_save(state, epoch, f1)
            if saved:
                print(f"==> checkpoint saved: {saved}")
        if stopping:
            break

    logger.close()  # the TB writer owns a background thread; don't leak it
    results["best_F1"] = best_f1
    # Collapse signature for the learnability gate: the max (over epochs)
    # number of entity types with nonzero F1 — a majority-class-collapsed
    # model never exceeds 1 regardless of seed wobble on the F1 scalar.
    results["best_learned_types"] = best_learned_types
    results["final_state"] = state
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(description="ViBERTgrid-TPU training")
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument(
        "-d",
        "--dataset",
        default="sroie",
        choices=["sroie", "ephoie", "funsd", "synthetic"],
    )
    parser.add_argument(
        "--max-steps", type=int, default=None,
        help="truncate training after N steps (smoke runs)",
    )
    args = parser.parse_args(argv)
    with open(args.config) as f:
        hyp = yaml.safe_load(f)
    spec = None
    dataset = args.dataset
    if dataset == "synthetic":
        # self-contained smoke path: generate the dataset if data_root is
        # missing, reuse it otherwise (no downloads, verify recipe #4)
        from vibertgrid_tpu.data.synthetic import (
            make_synthetic_root,
            synthetic_spec,
        )

        root = hyp.setdefault("data_root", "./synthetic_data")
        if not os.path.exists(os.path.join(root, "train")):
            make_synthetic_root(root, n_train=8, n_test=4, seed=0)
        hyp.setdefault("tokenizer_path", os.path.join(root, "vocab.txt"))
        spec = synthetic_spec()
        dataset = "sroie"
    train(hyp, dataset, spec=spec, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
