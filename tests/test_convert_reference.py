"""Reference-checkpoint converter vs the actual reference modules.

Imports the reference implementation from ``/root/reference`` (read-only;
torchvision is stubbed out — the plain ``resnet_18/34_fpn`` backbones never
execute it — and ``AutoConfig.from_pretrained`` is patched to a local
config so nothing touches the network), builds real ``ViBERTgridNet``
state dicts for all three classifier modes, converts them with
:func:`vibertgrid_tpu.models.convert_reference.load_reference_checkpoint`,
and checks:

1. every leaf of our params/batch_stats is overwritten (full coverage,
   no silently-skipped weights),
2. the converted backbone's forward matches the reference backbone's
   torch forward on a random image+grid (covers every conv/BN transpose,
   the early-fusion splice, FPN, and the P_fuse kernel/level order),
3. the converted RoI-embedding path matches (pins the CHW→HWC flatten
   permutation of the linear),
4. the simp-mode classifier probabilities match end-of-pipe,
5. CRF transitions copy exactly.
"""

import os
import sys
import types
import importlib.machinery

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def reference_net_factory(tmp_path_factory):
    """Callable building a reference ViBERTgridNet (eval mode, tiny BERT)."""

    def stub(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    if "torchvision" not in sys.modules:
        tv = stub("torchvision")
        models = stub("torchvision.models")
        ops = stub("torchvision.ops")

        class _FakeRoIAlign:
            """Functional stand-in for torchvision.ops.RoIAlign, backed by
            the published-algorithm numpy oracle (tests/oracles.py) — lets
            the ENTIRE reference ViBERTgridNet.forward run without
            torchvision (model/grid_roi_align.py:37-41 instantiates it).
            """

            def __init__(self, output_size=7, spatial_scale=1.0,
                         sampling_ratio=-1):
                self.output_size = (
                    output_size if isinstance(output_size, int)
                    else output_size[0]
                )
                self.spatial_scale = spatial_scale
                self.sampling_ratio = sampling_ratio

            def __call__(self, feat, rois):
                from tests.oracles import roi_align_np

                fnp = feat.detach().numpy().transpose(0, 2, 3, 1)
                outs = [
                    roi_align_np(
                        fnp[b],
                        np.asarray(r.detach().numpy(), np.float64),
                        self.output_size,
                        self.spatial_scale,
                        self.sampling_ratio,
                    ).transpose(0, 3, 1, 2)
                    for b, r in enumerate(rois)
                ]
                return torch.from_numpy(
                    np.concatenate(outs, 0).astype(np.float32)
                )

        models.resnet18 = lambda *a, **k: None
        models.resnet34 = lambda *a, **k: None
        ops.RoIAlign = _FakeRoIAlign
        tv.models = models
        tv.ops = ops
        tv.__version__ = "0.0.0-stub"

    import transformers
    from transformers import BertConfig, BertTokenizer

    tiny_bert = BertConfig(vocab_size=512, num_hidden_layers=2)
    transformers.AutoConfig.from_pretrained = classmethod(
        lambda cls, *a, **k: tiny_bert
    )

    vocab_dir = tmp_path_factory.mktemp("vocab")
    (vocab_dir / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                  + [f"w{i}" for i in range(100)])
    )
    tok = BertTokenizer(str(vocab_dir / "vocab.txt"))

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.ViBERTgrid_net import ViBERTgridNet as RefNet

    def build(classifier_mode, tag_to_idx=None, backbone="resnet_34_fpn",
              **overrides):
        torch.manual_seed(7)
        kwargs = dict(
            num_classes=5,
            image_mean=[0.9] * 3, image_std=[0.15] * 3,
            image_min_size=[512], image_max_size=800,
            test_image_min_size=512,
            bert_model="bert-base-uncased", tokenizer=tok,
            backbone=backbone, grid_mode="mean",
            early_fusion_downsampling_ratio=8, roi_shape=7,
            p_fuse_downsampling_ratio=4,
            late_fusion_fuse_embedding_channel=1024,
            loss_weights=None,
            num_hard_positive_main_1=8, num_hard_negative_main_1=8,
            num_hard_positive_main_2=8, num_hard_negative_main_2=8,
            loss_aux_sample_list=[64, 128, 64],
            num_hard_positive_aux=8, num_hard_negative_aux=8,
            loss_control_lambda=1.0, add_pos_neg=True,
            classifier_mode=classifier_mode, tag_to_idx=tag_to_idx,
            ohem_random=False, work_mode="eval",
        )
        kwargs.update(overrides)
        net = RefNet(**kwargs)
        net.eval()
        # Perturb every float param/buffer: torch and flax BN affine params
        # share identical inits (1/0), which would make the coverage check
        # blind to a skipped copy
        with torch.no_grad():
            for p in net.parameters():
                p.add_(torch.randn_like(p) * 0.02)
            for b in net.buffers():
                if b.dtype.is_floating_point:
                    b.add_(torch.rand_like(b) * 0.1)
        return net

    return build


def _our_variables(classifier_mode, tag_to_idx=None, backbone="resnet_34_fpn"):
    from __graft_entry__ import _make_batch
    from vibertgrid_tpu.models import ModelConfig, ViBERTgridNet
    from vibertgrid_tpu.models.bert import TextEncoderConfig

    cfg = ModelConfig(
        num_classes=5,
        bert_version="bert-base-uncased",
        backbone=backbone,
        classifier_mode=classifier_mode,
        tag_to_idx=tag_to_idx,
        text_config=TextEncoderConfig(vocab_size=512, num_layers=2),
    )
    model = ViBERTgridNet(cfg)
    batch = _make_batch(b=1, h=64, w=64, t=510, s=8, vocab=512)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True, compute_loss=True, key=jax.random.PRNGKey(2),
    )
    return model, dict(variables)


def _leaf_paths(tree):
    return {
        "/".join(getattr(k, "key", str(k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


@pytest.mark.parametrize(
    "mode,tag",
    [("simp", None), ("full", None), ("crf", {"O": 0, "B-a": 1, "I-a": 2})],
)
def test_full_coverage_all_modes(reference_net_factory, mode, tag):
    """Every leaf of params+batch_stats changes under conversion."""
    from vibertgrid_tpu.models.convert_reference import (
        load_reference_checkpoint,
    )

    # the reference ADDS START/STOP to the caller's tag dict in place
    # (field_type_classification_head.py:629-637) — give it a copy
    net = reference_net_factory(mode, dict(tag) if tag else None)
    sd = net.state_dict()
    _, variables = _our_variables(mode, tag)
    before = {
        "params": jax.tree_util.tree_map(np.asarray, variables["params"]),
        "batch_stats": jax.tree_util.tree_map(
            np.asarray, variables["batch_stats"]
        ),
    }
    out = load_reference_checkpoint(variables, sd)

    unchanged = []
    for group in ("params", "batch_stats"):
        flat_b = jax.tree_util.tree_flatten_with_path(before[group])[0]
        flat_a = dict(
            ("/".join(getattr(k, "key", str(k)) for k in p), v)
            for p, v in jax.tree_util.tree_flatten_with_path(out[group])[0]
        )
        for path, old in flat_b:
            name = "/".join(getattr(k, "key", str(k)) for k in path)
            new = np.asarray(flat_a[name])
            old = np.asarray(old)
            if old.shape == new.shape and np.array_equal(old, new):
                unchanged.append((group, name))
    assert not unchanged, unchanged


def test_backbone_forward_matches_reference(reference_net_factory):
    """Converted backbone == reference backbone forward (eval mode)."""
    from vibertgrid_tpu.models.convert_reference import (
        load_reference_checkpoint,
    )
    from vibertgrid_tpu.models.resnet_fpn import BACKBONE_REGISTRY, ResNetFPN

    net = reference_net_factory("simp")
    _, variables = _our_variables("simp")
    out = load_reference_checkpoint(variables, net.state_dict())

    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    grid = rng.standard_normal((1, 8, 8, 768)).astype(np.float32) * 0.1

    with torch.no_grad():
        want = net.backbone(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(grid.transpose(0, 3, 1, 2)),
        ).numpy().transpose(0, 2, 3, 1)

    bk = ResNetFPN(dtype=jnp.float32, **BACKBONE_REGISTRY["resnet_34_fpn"])
    got = bk.apply(
        {
            "params": out["params"]["backbone"],
            "batch_stats": out["batch_stats"]["backbone"],
        },
        jnp.asarray(img), jnp.asarray(grid), False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_roi_embedding_matches_reference(reference_net_factory):
    """Pins the CHW→HWC flatten permutation of the RoI linear."""
    from vibertgrid_tpu.models.convert_reference import (
        load_reference_checkpoint,
    )
    from vibertgrid_tpu.models.heads import ROIEmbedding

    net = reference_net_factory("simp")
    _, variables = _our_variables("simp")
    out = load_reference_checkpoint(variables, net.state_dict())

    rng = np.random.default_rng(1)
    rois = rng.standard_normal((4, 7, 7, 256)).astype(np.float32)
    with torch.no_grad():
        want = (
            net.late_fusion_net.ROI_embedding_net(
                torch.from_numpy(rois.transpose(0, 3, 1, 2))
            )
            .numpy()
        )
    got = ROIEmbedding(dtype=jnp.float32).apply(
        {
            "params": out["params"]["late_fusion"]["roi_embedding"],
            "batch_stats": out["batch_stats"]["late_fusion"]["roi_embedding"],
        },
        jnp.asarray(rois),
        jnp.ones((4,), bool),
        False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_simp_classifier_probs_match_reference(reference_net_factory):
    from vibertgrid_tpu.models.convert_reference import (
        load_reference_checkpoint,
    )
    from vibertgrid_tpu.models.heads import SimplifiedFieldTypeClassification

    net = reference_net_factory("simp")
    _, variables = _our_variables("simp")
    out = load_reference_checkpoint(variables, net.state_dict())

    rng = np.random.default_rng(2)
    fuse = rng.standard_normal((6, 1024)).astype(np.float32)
    with torch.no_grad():
        logits = net.field_type_classification_head.category_classification_net(
            torch.from_numpy(fuse)
        )
        want = torch.softmax(logits, dim=-1).numpy()

    head = SimplifiedFieldTypeClassification(num_classes=5, dtype=jnp.float32)
    _, _, probs = head.apply(
        {"params": out["params"]["field_type_head"]},
        jnp.asarray(fuse),
        jnp.zeros((6,), jnp.int32),
        jnp.ones((6,), bool),
        train=False,
        compute_loss=False,
        key=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(probs), want, atol=1e-5)


def test_crf_transitions_copy_exactly(reference_net_factory):
    from vibertgrid_tpu.models.convert_reference import (
        load_reference_checkpoint,
    )

    tag = {"O": 0, "B-a": 1, "I-a": 2}
    net = reference_net_factory("crf", dict(tag))  # ref mutates the dict
    _, variables = _our_variables("crf", tag)
    out = load_reference_checkpoint(variables, net.state_dict())
    want = net.field_type_classification_head.crf_layer.transitions
    np.testing.assert_array_equal(
        np.asarray(out["params"]["field_type_head"]["transitions"]),
        want.detach().numpy(),
    )


def test_backbone_d_variant_matches_reference(reference_net_factory):
    """resnet_18_D_fpn: the AvgPool-shortcut (D) blocks map by index shift."""
    from vibertgrid_tpu.models.convert_reference import (
        load_reference_checkpoint,
    )
    from vibertgrid_tpu.models.resnet_fpn import BACKBONE_REGISTRY, ResNetFPN

    net = reference_net_factory("simp", backbone="resnet_18_D_fpn")
    _, variables = _our_variables("simp", backbone="resnet_18_D_fpn")
    out = load_reference_checkpoint(variables, net.state_dict())

    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    grid = rng.standard_normal((1, 8, 8, 768)).astype(np.float32) * 0.1
    with torch.no_grad():
        want = net.backbone(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(grid.transpose(0, 3, 1, 2)),
        ).numpy().transpose(0, 2, 3, 1)
    bk = ResNetFPN(dtype=jnp.float32, **BACKBONE_REGISTRY["resnet_18_D_fpn"])
    got = bk.apply(
        {
            "params": out["params"]["backbone"],
            "batch_stats": out["batch_stats"]["backbone"],
        },
        jnp.asarray(img), jnp.asarray(grid), False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "mode,tok_counts",
    [
        ("simp", (24,)),      # single window, single doc
        ("simp", (560, 300)), # 2 windows, 2 docs of unequal length: [SEP]
                              # lands at 1 + (batch_max - 510) in the last
                              # window for BOTH docs (the reference frames
                              # windows off the padded batch corpus,
                              # BERTgrid_generator.py:106-129)
        ("full", (24, 40)),   # paper's two-stage head, gated per-class BCE
        ("crf", (24,)),       # emission MLP + Viterbi decode
    ],
)
def test_full_net_forward_matches_reference(
    reference_net_factory, mode, tok_counts
):
    """End-to-end numeric gate over the ENTIRE net (VERDICT r2 task 6).

    Runs the complete reference ``ViBERTgridNet.forward``
    (model/ViBERTgrid_net.py:501-544 — transform → windowed BERT → segment
    aggregation → BERTgrid scatter → ResNet-FPN w/ early fusion → aux seg
    head → RoIAlign → late fusion → simp classifier → total loss) and our
    full forward on identical converted weights and an identical raw
    document, comparing loss, per-segment probabilities, and the seg-head
    logit maps at fp32. Fails if any inter-component wiring drifts.

    OHEM/sampling knobs are set so every loss keeps ALL candidates (plain
    losses via -1/None, pipeline/custom_loss.py:36-44, 128-136; the full
    head's BCELossRandomSample cannot take -1 — counts larger than any
    candidate pool keep everything, custom_loss.py:260-268) so both sides
    are deterministic and the comparison is robust to sub-ulp selection
    flips; the RoIAlign stub implements published torchvision semantics
    (tests/oracles.py). The 64x64 image equals test_image_min_size, making
    the resize the identity — transform parity at other scales is covered
    by tests/test_ops.py's torch-bilinear oracle tests.
    """
    from vibertgrid_tpu.data.dataset import Collator, Sample
    from vibertgrid_tpu.data.transform import ImageTransform
    from vibertgrid_tpu.models import ModelConfig, ViBERTgridNet
    from vibertgrid_tpu.models.bert import TextEncoderConfig
    from vibertgrid_tpu.models.convert_reference import (
        load_reference_checkpoint,
    )

    tag = {"O": 0, "B-a": 1, "I-a": 2} if mode == "crf" else None
    hard = 999 if mode == "full" else -1  # full head: keep-all, see docstring
    net = reference_net_factory(
        mode,
        dict(tag) if tag else None,  # the reference mutates the dict
        image_min_size=[64], test_image_min_size=64, image_max_size=128,
        num_hard_positive_main_1=hard, num_hard_negative_main_1=hard,
        num_hard_positive_main_2=hard, num_hard_negative_main_2=hard,
        loss_aux_sample_list=None,
        num_hard_positive_aux=-1, num_hard_negative_aux=-1,
    )

    rng = np.random.default_rng(11)
    n_seg = 8
    if mode == "crf":
        classes = np.array([0, 1, 2, 1, 2, 0, 1, 0], np.int32)  # tag ids
    else:
        classes = np.array([0, 1, 2, 3, 4, 0, 2, 1], np.int32)
    samples = []
    for n_tok in tok_counts:
        image = rng.random((64, 64, 3)).astype(np.float32)  # ToTensor [0,1]
        x0 = rng.integers(0, 40, n_seg)
        y0 = rng.integers(0, 44, n_seg)
        boxes = np.stack(
            [x0, y0, x0 + rng.integers(8, 24, n_seg),
             y0 + rng.integers(4, 16, n_seg)], 1
        ).astype(np.int32)
        seg_ids = np.sort(
            np.concatenate(
                [np.arange(n_seg), rng.integers(0, n_seg, n_tok - n_seg)]
            )
        ).astype(np.int32)
        tokens = rng.integers(5, 500, n_tok).astype(np.int32)
        samples.append(
            Sample(
                image=image, tokens=tokens, seg_ids=seg_ids, boxes=boxes,
                seg_classes=classes, texts=[f"t{i}" for i in range(n_seg)],
            )
        )

    # --- the reference net on the raw documents (padded batch corpus, the
    # pad_sequence + mask semantics of data/SROIE_dataset.py:184-187) ---
    lmax = max(tok_counts)
    corpus = np.zeros((len(samples), lmax), np.int64)
    cmask = np.zeros((len(samples), lmax), np.int32)
    for i, s in enumerate(samples):
        corpus[i, : len(s.tokens)] = s.tokens
        cmask[i, : len(s.tokens)] = 1
    with torch.no_grad():
        ref_loss, ref_mask, ref_ss, ref_gt, ref_pred = net(
            tuple(torch.from_numpy(s.image.transpose(2, 0, 1)) for s in samples),
            tuple(torch.from_numpy(s.seg_ids).int() for s in samples),
            tuple(torch.from_numpy(s.seg_classes).int() for s in samples),
            tuple(torch.from_numpy(s.boxes.astype(np.int64)) for s in samples),
            torch.from_numpy(corpus),
            torch.from_numpy(cmask),
        )

    # --- our net, same raw documents through the host pipeline ---
    cfg = ModelConfig(
        num_classes=5,
        bert_version="bert-base-uncased",
        backbone="resnet_34_fpn",
        classifier_mode=mode,
        tag_to_idx=tag,
        num_hard_positive_main_1=hard, num_hard_negative_main_1=hard,
        num_hard_positive_main_2=hard, num_hard_negative_main_2=hard,
        text_config=TextEncoderConfig(vocab_size=512, num_layers=2),
    )
    model = ViBERTgridNet(cfg)
    tr = ImageTransform([0.9] * 3, [0.15] * 3, [64], 64, 128)
    batch, _ = Collator(tr)(samples, train=False)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True, compute_loss=True, key=jax.random.PRNGKey(2),
    )
    variables = load_reference_checkpoint(dict(variables), net.state_dict())
    out = model.apply(
        variables, batch, train=False, compute_loss=True,
        key=jax.random.PRNGKey(0),
    )

    got_pred = np.concatenate(
        [np.asarray(out.pred_label, np.float32)[i, :n_seg]
         for i in range(len(samples))]
    )
    if mode == "crf":
        # decoded Viterbi tag ids, reference shape [N, 1] float
        np.testing.assert_array_equal(
            got_pred.astype(np.int64), ref_pred.numpy().reshape(-1).astype(np.int64)
        )
    else:
        np.testing.assert_allclose(got_pred, ref_pred.numpy(), atol=1e-3)
    got_gt = np.concatenate(
        [np.asarray(out.gt_label)[i, :n_seg] for i in range(len(samples))]
    )
    np.testing.assert_array_equal(got_gt, ref_gt.numpy())
    got_loss = float(out.total_loss)
    want_loss = float(ref_loss)
    assert got_loss == pytest.approx(want_loss, rel=2e-3), (
        got_loss, want_loss,
    )
    if out.pred_mask is not None:
        np.testing.assert_allclose(
            np.asarray(out.pred_mask, np.float32).transpose(0, 3, 1, 2),
            ref_mask.numpy(),
            atol=2e-3,
        )
    if out.pred_ss is not None:
        np.testing.assert_allclose(
            np.asarray(out.pred_ss, np.float32).transpose(0, 3, 1, 2),
            ref_ss.numpy(),
            atol=2e-3,
        )


def test_driver_reference_weights_splice(reference_net_factory, tmp_path):
    """The driver/CLI `reference_weights:` path: a saved reference .pt
    converts into a TrainState via load_pretrained_into_state."""
    import optax

    from __graft_entry__ import _make_batch
    from vibertgrid_tpu.train.driver import load_pretrained_into_state
    from vibertgrid_tpu.train.state import create_train_state

    net = reference_net_factory("simp")
    path = tmp_path / "reference_ckpt.pt"
    torch.save({"model": net.state_dict()}, str(path))

    from vibertgrid_tpu.models import ModelConfig, ViBERTgridNet
    from vibertgrid_tpu.models.bert import TextEncoderConfig

    cfg = ModelConfig(
        num_classes=5, bert_version="bert-base-uncased",
        backbone="resnet_34_fpn", classifier_mode="simp",
        text_config=TextEncoderConfig(vocab_size=512, num_layers=2),
    )
    model = ViBERTgridNet(cfg)
    batch = _make_batch(b=1, h=64, w=64, t=510, s=8, vocab=512)
    state = create_train_state(model, optax.sgd(1e-3), batch, seed=0)
    before = np.asarray(state.params["backbone"]["stem_conv"]["kernel"])
    state2 = load_pretrained_into_state(
        state, {"reference_weights": str(path)}, cfg
    )
    after = np.asarray(state2.params["backbone"]["stem_conv"]["kernel"])
    assert not np.array_equal(before, after)
    want = net.state_dict()["backbone.conv_1.0.weight"].numpy()
    np.testing.assert_allclose(after, want.transpose(2, 3, 1, 0), atol=0)
