"""BERT / RoBERTa text encoder in Flax.

TPU-native replacement for the HF ``BertModel`` / ``RobertaModel`` the
reference instantiates (``/root/reference/model/ViBERTgrid_net.py:218-279``).
The encoder compiles into the same jit graph as the CNN backbone; windowed
long corpora arrive pre-folded into the batch axis (see
:mod:`vibertgrid_tpu.ops.windows`), so one call encodes every window of every
document — replacing the reference's per-window Python loop
(``model/BERTgrid_generator.py:99-146``).

Weight ingestion from HuggingFace PyTorch checkpoints (local files only — no
network) lives in :func:`load_hf_weights`. The registry mirrors the
reference's 7-entry ``bert_model_list`` (``model/ViBERTgrid_net.py:218-226``).

Matmuls run in a configurable compute dtype (bf16 on TPU) with fp32 params
and fp32 layernorm/softmax accumulation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from vibertgrid_tpu.models.norm import LayerNorm
from vibertgrid_tpu.ops.dropout import derive_seed, hash_dropout


class HashDropout(nn.Module):
    """Counter-based dropout (ops/dropout.py): splitmix hash mask instead of
    per-element threefry, mask rematerialised in the backward pass. ~3 ms/step
    cheaper than ``nn.Dropout`` across the encoder's 25 sites at bench shapes
    and no [B, T, D] mask residuals."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate <= 0.0:
            return x
        return hash_dropout(x, derive_seed(self.make_rng("dropout")), self.rate)


# name → (hidden size, flavor). Mirrors the reference's 7-entry
# bert_model_list (model/ViBERTgrid_net.py:218-226) exactly, plus two tiny
# test configs. "private_bert-base-uncased" is the reference's alias for a
# locally fine-tuned BERT-base checkpoint — same architecture, weights loaded
# from local files (which is the only load path here anyway).
BERT_MODEL_REGISTRY = {
    "private_bert-base-uncased": (768, "bert"),
    "bert-base-uncased": (768, "bert"),
    "bert-base-cased": (768, "bert"),
    "roberta-base": (768, "roberta"),
    "bert-base-chinese": (768, "bert"),
    "hfl/chinese-bert-wwm-ext": (768, "bert"),
    "hfl/chinese-bert-wwm": (768, "bert"),
    "tiny-bert-test": (64, "bert"),  # for unit tests
    "tiny-roberta-test": (64, "roberta"),  # for unit tests
}


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    flavor: str = "bert"  # "bert" | "roberta"
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    # "auto": fused Pallas attention on TPU; "flash"/"xla" force a path.
    # Multi-device meshes keep the fused kernel via a shard_map wrapper
    # (batch on `data`, heads on `model` — see flash_attention_sharded) when
    # `mesh` is set and the head/batch counts divide the axis sizes; the XLA
    # einsum path remains the oracle, the CPU default, and the fallback when
    # they don't.
    attention_impl: str = "auto"
    # "fused": the fused FFN Pallas kernel (GEMM→gelu→GEMM→dropout→residual→
    # LN in one VMEM-resident program, ops/fused_ffn.py), per data shard
    # under a pure-DP mesh; falls back to the einsum path under TP (the
    # partial FFN outputs need a psum before residual+LN) and when no VMEM-
    # feasible row tile exists (fp32 BERT-base widths). Off-TPU, forced
    # "fused" runs interpreted (tests); the train driver rewrites it to
    # "xla" on multi-device CPU meshes, which need GSPMD partitioning.
    # "auto": the kernel for deterministic (inference/eval) passes on real
    # TPU — measured −26% encoder forward (tools/ffn_micro.py) — and the
    # einsum path for training, whose fwd+bwd is faster in XLA (the kernel's
    # VJP rematerialises the forward; see EncoderLayer).
    ffn_impl: str = "auto"
    # Attention epilogue (out-projection→dropout→residual→LN) kernel gate,
    # A/B-able independently of the FFN tail: "fused" runs fused_proj_ln
    # wherever the FFN gate allows kernels at all; "auto" follows the
    # measured default, which is the EINSUM epilogue — two chip A/Bs found
    # the fused epilogue ~0.3 ms slower (see EncoderLayer comment).
    attn_epilogue: str = "auto"
    # Device mesh with ("data", "model") axes for the sharded kernel wrapper;
    # None (or a 1-device mesh) selects the plain single-device kernel.
    mesh: Any = None

    @staticmethod
    def tiny(flavor: str = "bert") -> "TextEncoderConfig":
        return TextEncoderConfig(
            vocab_size=512,
            hidden_size=64,
            num_layers=2,
            num_heads=4,
            intermediate_size=128,
            max_position_embeddings=520 if flavor == "roberta" else 512,
            flavor=flavor,
            pad_token_id=1 if flavor == "roberta" else 0,
        )

    @staticmethod
    def base(flavor: str = "bert", vocab_size: int | None = None) -> "TextEncoderConfig":
        if flavor == "roberta":
            return TextEncoderConfig(
                vocab_size=vocab_size or 50265,
                max_position_embeddings=514,
                pad_token_id=1,
                flavor="roberta",
            )
        return TextEncoderConfig(vocab_size=vocab_size or 30522)


class SelfAttention(nn.Module):
    config: TextEncoderConfig
    dtype: Any = jnp.float32
    # When True, skip the out-projection Dense and return
    # (ctx [b,t,d], w_out, b_out) so the caller can run the fused
    # projection→dropout→residual→LayerNorm epilogue (ops/fused_ffn.py::
    # fused_proj_ln). The params are created here under the SAME
    # "out/{kernel,bias}" names nn.Dense would use, so checkpoints and HF
    # loading see one tree regardless of the epilogue impl.
    return_ctx: bool = False

    @nn.compact
    def __call__(self, hidden, attn_bias, deterministic=True):
        cfg = self.config
        d = cfg.hidden_size
        h = cfg.num_heads
        dh = d // h
        dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        q = dense("query")(hidden)
        k = dense("key")(hidden)
        v = dense("value")(hidden)
        b, t = hidden.shape[:2]
        use_flash = cfg.attention_impl == "flash" or (
            cfg.attention_impl == "auto" and jax.default_backend() == "tpu"
        )
        mesh = cfg.mesh
        n_mesh = 1
        if mesh is not None:
            n_mesh = mesh.devices.size
            dp = mesh.shape.get("data", 1)
            mp = mesh.shape.get("model", 1)
            if n_mesh > 1 and (dp * mp != n_mesh or h % mp or b % dp):
                # non-(data, model) mesh or indivisible head/batch counts:
                # einsum path (GSPMD partitions it)
                use_flash = False
        if use_flash:
            # Packed-head fused kernel: consumes the projection outputs
            # [b, t, h·dh] directly, so no head transposes exist at all.
            # Attention-prob dropout runs in-kernel off a per-step seed.
            from vibertgrid_tpu.ops.flash_attention import (
                flash_attention,
                flash_attention_sharded,
            )

            rate = 0.0 if deterministic else cfg.attention_dropout
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32
                )
            else:
                seed = jnp.zeros((), jnp.int32)
            args = (
                q,
                k,
                v,
                attn_bias[:, 0, 0, :],
                seed,
                1.0 / float(dh) ** 0.5,
                h,
                rate,
                jax.default_backend() != "tpu",  # interpret off-TPU (tests)
            )
            if n_mesh > 1:
                ctx = flash_attention_sharded(*args, mesh=mesh)
            else:
                ctx = flash_attention(*args)
        else:
            q = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
            k = k.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
            v = v.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / jnp.sqrt(dh).astype(jnp.float32)
            scores = scores + attn_bias  # [b, 1, 1, t] additive mask
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            probs = HashDropout(cfg.attention_dropout)(
                probs, deterministic=deterministic
            )
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3)
            ctx = ctx.reshape(b, t, d)
        if self.return_ctx:
            w_out, b_out = _DenseParams(d, name="out")(d)
            return ctx, w_out, b_out
        out = nn.Dense(d, dtype=self.dtype, name="out")(ctx)
        return out


class _DenseParams(nn.Module):
    """Parameter twin of ``nn.Dense`` (same names, shapes, initializers):
    lets the fused-FFN branch own the identical param tree the einsum branch
    creates via ``nn.Dense`` — checkpoints and HF weight loading see one
    layout regardless of ``ffn_impl``."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class _LayerNormParams(nn.Module):
    """Parameter twin of :class:`LayerNorm` (scale/bias)."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        return scale, bias


class EncoderLayer(nn.Module):
    config: TextEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, attn_bias, deterministic=True):
        cfg = self.config
        mesh = cfg.mesh
        b, t, d = hidden.shape
        multi = mesh is not None and mesh.devices.size > 1
        # FFN kernel gate. Chip A/B (tools/ffn_micro.py, v5e, bs16×512,
        # ITERS=200, 2026-08-19): encoder fwd 10.6 (kernel) vs 14.3 ms
        # (einsum), −26%; fwd+bwd 39.6 ms with the saved-intermediate VJP
        # (fused_ffn_saved, minimal 4-GEMM backward) vs 46.5 einsum (−15%)
        # vs 48.9 with the remat VJP. "auto" therefore selects kernels for
        # EVERY pass on real TPU: the residual-free fused_ffn when
        # deterministic (nothing differentiates), fused_ffn_saved on grad
        # paths. "fused" forces the remat-VJP kernel, "fused-saved" the
        # saved variant, "xla" the einsum path (tests run interpreted
        # off-TPU).
        use_fused = cfg.ffn_impl in ("fused", "fused-saved") or (
            cfg.ffn_impl == "auto" and jax.default_backend() == "tpu"
        )
        use_saved = (
            use_fused
            and not deterministic
            and cfg.ffn_impl in ("fused-saved", "auto")
        )
        if use_fused and multi:
            dp = mesh.shape.get("data", 1)
            mp = mesh.shape.get("model", 1)
            if mp > 1 or dp * mp != mesh.devices.size or b % dp:
                # TP shards the FFN weights on the intermediate dim (and the
                # out-proj on the input dim) — the partial outputs need a
                # psum before residual+LN, the fusion boundary; non-(data,
                # model) meshes and indivisible batches can't row-shard:
                # einsum path.
                use_fused = False
        interpret = jax.default_backend() != "tpu"  # tests
        # The attention epilogue is gated separately: fused_proj_ln is
        # oracle-exact, but two independent chip A/Bs measured the encoder
        # forward consistently ~0.3 ms WORSE with it (10.90/10.91 vs
        # 10.62-10.64 FFN-kernel-only — the out-projection GEMM already
        # overlaps the elementwise tail, and the kernel serializes it), so
        # "auto" keeps the einsum epilogue; "fused" opts in.
        use_fused_ep = use_fused and cfg.attn_epilogue == "fused"

        if use_fused_ep:
            # Attention with the projection→dropout→residual→LayerNorm
            # epilogue fused into one row-tiled kernel: the einsum path's
            # three [N, D] HBM round-trips (projection out, residual sum,
            # LN read) collapse to ctx+residual in, normalized out.
            from vibertgrid_tpu.ops.fused_ffn import (
                fused_proj_ln,
                fused_proj_ln_sharded,
            )

            ctx, w_out, b_out = SelfAttention(
                cfg, self.dtype, name="attention", return_ctx=True
            )(hidden, attn_bias, deterministic)
            g_a, bt_a = _LayerNormParams(name="attention_ln")(d)
            rate = 0.0 if deterministic else cfg.hidden_dropout
            if rate > 0.0:
                seed = derive_seed(self.make_rng("dropout"))
            else:
                seed = jnp.zeros((), jnp.int32)
            ctx2d = ctx.reshape(b * t, d)
            res2d = hidden.reshape(b * t, d)
            if multi:
                h2d = fused_proj_ln_sharded(
                    ctx2d, res2d, w_out, b_out, g_a, bt_a, seed,
                    cfg.layer_norm_eps, rate, interpret, mesh=mesh,
                )
            else:
                h2d = fused_proj_ln(
                    ctx2d, res2d, w_out, b_out, g_a, bt_a, seed,
                    cfg.layer_norm_eps, rate, interpret,
                )
            hidden = h2d.reshape(b, t, d)
        else:
            attn = SelfAttention(cfg, self.dtype, name="attention")(
                hidden, attn_bias, deterministic
            )
            attn = HashDropout(cfg.hidden_dropout)(
                attn, deterministic=deterministic
            )
            hidden = LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                name="attention_ln",
            )(hidden + attn)

        if use_fused:
            from vibertgrid_tpu.ops.fused_ffn import (
                fused_ffn,
                fused_ffn_saved,
                fused_ffn_saved_sharded,
                fused_ffn_sharded,
            )

            d = cfg.hidden_size
            w1, b1 = _DenseParams(cfg.intermediate_size, name="intermediate")(d)
            w2, b2 = _DenseParams(d, name="output")(cfg.intermediate_size)
            g, bt = _LayerNormParams(name="output_ln")(d)
            rate = 0.0 if deterministic else cfg.hidden_dropout
            if rate > 0.0:
                seed = derive_seed(self.make_rng("dropout"))
            else:
                seed = jnp.zeros((), jnp.int32)
            x2d = hidden.reshape(b * t, d)
            interpret = jax.default_backend() != "tpu"  # tests
            if multi:
                fn = fused_ffn_saved_sharded if use_saved else fused_ffn_sharded
                out2d = fn(
                    x2d, w1, b1, w2, b2, g, bt, seed,
                    cfg.layer_norm_eps, rate, interpret, mesh=mesh,
                )
            else:
                fn = fused_ffn_saved if use_saved else fused_ffn
                out2d = fn(
                    x2d, w1, b1, w2, b2, g, bt, seed,
                    cfg.layer_norm_eps, rate, interpret,
                )
            return out2d.reshape(b, t, d)

        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(
            hidden
        )
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(inter)
        out = HashDropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        hidden = LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="output_ln"
        )(hidden + out)
        return hidden


class TextEncoder(nn.Module):
    """BERT/RoBERTa encoder returning the last hidden state.

    ``__call__(input_ids [B,T], attention_mask [B,T])`` → ``[B, T, D]``.
    """

    config: TextEncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        cfg = self.config
        b, t = input_ids.shape
        if cfg.flavor == "roberta":
            # HF create_position_ids_from_input_ids: pad positions keep
            # padding_idx; others count from padding_idx + 1.
            not_pad = (input_ids != cfg.pad_token_id).astype(jnp.int32)
            position_ids = jnp.cumsum(not_pad, axis=1) * not_pad + cfg.pad_token_id
        else:
            position_ids = jnp.arange(t, dtype=jnp.int32)[None, :].repeat(b, axis=0)
        token_type_ids = jnp.zeros_like(input_ids)

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings")(
            input_ids
        )
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="position_embeddings"
        )(position_ids)
        typ = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, name="token_type_embeddings"
        )(token_type_ids)
        hidden = LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="embeddings_ln"
        )(word + pos + typ)
        hidden = HashDropout(cfg.hidden_dropout)(hidden, deterministic=deterministic)
        hidden = hidden.astype(self.dtype)

        attn_bias = jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, -1e9
        ).astype(jnp.float32)

        for i in range(cfg.num_layers):
            hidden = EncoderLayer(cfg, self.dtype, name=f"layer_{i}")(
                hidden, attn_bias, deterministic
            )
        return hidden


# ---------------------------------------------------------------------------
# HuggingFace weight ingestion (local checkpoints only; no network access).
# ---------------------------------------------------------------------------


def load_hf_weights(params: dict, state_dict: dict, num_layers: int) -> dict:
    """Map a HF ``BertModel``/``RobertaModel`` PyTorch state dict onto the
    :class:`TextEncoder` param tree.

    ``state_dict`` values may be torch tensors or numpy arrays. Keys may carry
    a ``bert.``/``roberta.`` prefix. Returns a new params dict.
    """
    import numpy as np

    def get(name):
        for prefix in ("", "bert.", "roberta."):
            key = prefix + name
            if key in state_dict:
                v = state_dict[key]
                return np.asarray(v.numpy() if hasattr(v, "numpy") else v)
        raise KeyError(name)

    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy

    def set_(path, value):
        node = p
        for k in path[:-1]:
            node = node[k]
        assert node[path[-1]].shape == value.shape, (
            path,
            node[path[-1]].shape,
            value.shape,
        )
        node[path[-1]] = jnp.asarray(value, jnp.float32)

    set_(["word_embeddings", "embedding"], get("embeddings.word_embeddings.weight"))
    set_(
        ["position_embeddings", "embedding"],
        get("embeddings.position_embeddings.weight"),
    )
    set_(
        ["token_type_embeddings", "embedding"],
        get("embeddings.token_type_embeddings.weight"),
    )
    set_(["embeddings_ln", "scale"], get("embeddings.LayerNorm.weight"))
    set_(["embeddings_ln", "bias"], get("embeddings.LayerNorm.bias"))

    for i in range(num_layers):
        hf = f"encoder.layer.{i}"
        layer = f"layer_{i}"
        for ours, theirs in [
            ("query", "attention.self.query"),
            ("key", "attention.self.key"),
            ("value", "attention.self.value"),
            ("out", "attention.output.dense"),
        ]:
            set_([layer, "attention", ours, "kernel"], get(f"{hf}.{theirs}.weight").T)
            set_([layer, "attention", ours, "bias"], get(f"{hf}.{theirs}.bias"))
        set_(
            [layer, "attention_ln", "scale"],
            get(f"{hf}.attention.output.LayerNorm.weight"),
        )
        set_(
            [layer, "attention_ln", "bias"],
            get(f"{hf}.attention.output.LayerNorm.bias"),
        )
        set_([layer, "intermediate", "kernel"], get(f"{hf}.intermediate.dense.weight").T)
        set_([layer, "intermediate", "bias"], get(f"{hf}.intermediate.dense.bias"))
        set_([layer, "output", "kernel"], get(f"{hf}.output.dense.weight").T)
        set_([layer, "output", "bias"], get(f"{hf}.output.dense.bias"))
        set_([layer, "output_ln", "scale"], get(f"{hf}.output.LayerNorm.weight"))
        set_([layer, "output_ln", "bias"], get(f"{hf}.output.LayerNorm.bias"))
    return p
