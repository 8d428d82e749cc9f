"""Fused FFN Pallas kernel (interpret mode on CPU) vs oracles.

Covers: forward parity vs an independently composed flax oracle
(Dense→gelu→Dense→residual→LayerNorm), gradient parity through the custom
VJP (all seven differentiable args), dropout keep-pattern identity between
the kernel and the XLA reference it rematerialises in backward, the
non-multiple-row padding path, encoder-level impl equivalence + param-tree
identity, and the shard_map wrapper (row sharding, replicated-weight
gradient accumulation, per-shard dropout decorrelation).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from vibertgrid_tpu.ops.fused_ffn import (
    ffn_reference,
    fused_ffn,
    fused_ffn_sharded,
)

RNG = np.random.default_rng(5)
SEED0 = jnp.zeros((), jnp.int32)
EPS = 1e-12


def _params(d=64, f=128):
    w1 = jnp.asarray(RNG.standard_normal((d, f)) * 0.1, jnp.float32)
    b1 = jnp.asarray(RNG.standard_normal(f) * 0.1, jnp.float32)
    w2 = jnp.asarray(RNG.standard_normal((f, d)) * 0.1, jnp.float32)
    b2 = jnp.asarray(RNG.standard_normal(d) * 0.1, jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(d), jnp.float32)
    bt = jnp.asarray(0.1 * RNG.standard_normal(d), jnp.float32)
    return w1, b1, w2, b2, g, bt


def _flax_oracle(x, w1, b1, w2, b2, g, bt):
    """The einsum-path EncoderLayer FFN tail, composed from flax pieces."""
    import flax.linen as nn

    from vibertgrid_tpu.models.norm import LayerNorm

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, x):
            inter = nn.Dense(w1.shape[1], name="i")(x)
            inter = nn.gelu(inter, approximate=False)
            out = nn.Dense(w2.shape[1], name="o")(inter)
            return LayerNorm(epsilon=EPS, name="ln")(x + out)

    variables = {
        "params": {
            "i": {"kernel": w1, "bias": b1},
            "o": {"kernel": w2, "bias": b2},
            "ln": {"scale": g, "bias": bt},
        }
    }
    return Tail().apply(variables, x)


def test_fused_ffn_forward_matches_flax_oracle():
    w1, b1, w2, b2, g, bt = _params()
    x = jnp.asarray(RNG.standard_normal((48, 64)), jnp.float32)  # pads to 512
    got = fused_ffn(x, w1, b1, w2, b2, g, bt, SEED0, EPS, 0.0, True)
    want = _flax_oracle(x, w1, b1, w2, b2, g, bt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_ffn_matches_reference_formulation():
    w1, b1, w2, b2, g, bt = _params()
    x = jnp.asarray(RNG.standard_normal((16, 64)), jnp.float32)
    got = fused_ffn(x, w1, b1, w2, b2, g, bt, SEED0, EPS, 0.0, True)
    want = ffn_reference(x, w1, b1, w2, b2, g, bt, SEED0, EPS, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_fused_ffn_grads_match_reference():
    w1, b1, w2, b2, g, bt = _params()
    x = jnp.asarray(RNG.standard_normal((24, 64)), jnp.float32)
    w = jnp.asarray(RNG.standard_normal((24, 64)), jnp.float32)

    def loss_k(*args):
        return jnp.sum(fused_ffn(*args, SEED0, EPS, 0.0, True) * w)

    def loss_r(*args):
        return jnp.sum(ffn_reference(*args, SEED0, EPS, 0.0) * w)

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(x, w1, b1, w2, b2, g, bt)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(x, w1, b1, w2, b2, g, bt)
    for a, b, name in zip(gk, gr, ["x", "w1", "b1", "w2", "b2", "g", "bt"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=name
        )


def test_fused_ffn_dropout_pattern_matches_reference():
    """Keep DECISIONS are bit-identical between the in-kernel hash and the
    XLA reference the backward rematerialises (same splitmix32 of
    (seed, global flat index)) — including across row-tile boundaries."""
    w1, b1, w2, b2, g, bt = _params()
    x = jnp.asarray(RNG.standard_normal((40, 64)), jnp.float32)
    seed = jnp.asarray(99, jnp.int32)
    rate = 0.5
    got = np.asarray(fused_ffn(x, w1, b1, w2, b2, g, bt, seed, EPS, rate, True))
    want = np.asarray(ffn_reference(x, w1, b1, w2, b2, g, bt, seed, EPS, rate))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # a different seed must change the output
    other = np.asarray(
        fused_ffn(x, w1, b1, w2, b2, g, bt, seed + 1, EPS, rate, True)
    )
    assert not np.allclose(got, other)


def test_encoder_fused_ffn_matches_xla_and_shares_param_tree():
    from vibertgrid_tpu.models.bert import TextEncoder, TextEncoderConfig

    cfg = TextEncoderConfig.tiny()
    ids = jnp.asarray(RNG.integers(3, 500, (2, 40)), jnp.int32)
    mask = jnp.ones((2, 40), jnp.int32).at[:, 30:].set(0)

    enc_xla = TextEncoder(dataclasses.replace(cfg, ffn_impl="xla"))
    variables = enc_xla.init(jax.random.PRNGKey(0), ids, mask)
    out_xla = enc_xla.apply(variables, ids, mask)

    enc_fused = TextEncoder(dataclasses.replace(cfg, ffn_impl="fused"))
    # identical param tree: init under the fused branch gives the same
    # structure AND the xla-trained variables drop straight in
    v2 = enc_fused.init(jax.random.PRNGKey(0), ids, mask)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(
        variables
    )
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: a.shape == b.shape and a.dtype == b.dtype,
            v2,
            variables,
        )
    )
    out_fused = enc_fused.apply(variables, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), atol=3e-5
    )


def test_encoder_fused_epilogue_matches_xla():
    """attn_epilogue='fused' routes the out-projection→residual→LN tail
    through fused_proj_ln inside the encoder; output must match the einsum
    path from the same variables ('auto' keeps einsum — measured slower on
    chip — so the fused path needs its own coverage)."""
    from vibertgrid_tpu.models.bert import TextEncoder, TextEncoderConfig

    cfg = TextEncoderConfig.tiny()
    ids = jnp.asarray(RNG.integers(3, 500, (2, 40)), jnp.int32)
    mask = jnp.ones((2, 40), jnp.int32).at[:, 30:].set(0)
    enc_xla = TextEncoder(dataclasses.replace(cfg, ffn_impl="xla"))
    variables = enc_xla.init(jax.random.PRNGKey(0), ids, mask)
    enc_ep = TextEncoder(
        dataclasses.replace(cfg, ffn_impl="fused", attn_epilogue="fused")
    )
    assert jax.tree_util.tree_structure(
        enc_ep.init(jax.random.PRNGKey(0), ids, mask)
    ) == jax.tree_util.tree_structure(variables)
    np.testing.assert_allclose(
        np.asarray(enc_ep.apply(variables, ids, mask)),
        np.asarray(enc_xla.apply(variables, ids, mask)),
        atol=3e-5,
    )


def _mesh(data, model):
    from jax.sharding import Mesh

    return Mesh(
        np.array(jax.devices()[: data * model]).reshape(data, model),
        ("data", "model"),
    )


def test_fused_ffn_sharded_forward_and_weight_grads():
    """Row-sharded kernel == unsharded, INCLUDING the replicated-weight
    gradients (each shard contributes its rows; the shard_map transpose of
    a P() input must sum them)."""
    mesh = _mesh(4, 1)
    w1, b1, w2, b2, g, bt = _params()
    x = jnp.asarray(RNG.standard_normal((32, 64)), jnp.float32)
    w = jnp.asarray(RNG.standard_normal((32, 64)), jnp.float32)

    got = jax.jit(
        lambda x: fused_ffn_sharded(
            x, w1, b1, w2, b2, g, bt, SEED0, EPS, 0.0, True, mesh=mesh
        )
    )(x)
    want = fused_ffn(x, w1, b1, w2, b2, g, bt, SEED0, EPS, 0.0, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def loss_sh(x, w1, b1, w2, b2, g, bt):
        return jnp.sum(
            fused_ffn_sharded(
                x, w1, b1, w2, b2, g, bt, SEED0, EPS, 0.0, True, mesh=mesh
            )
            * w
        )

    def loss_plain(x, w1, b1, w2, b2, g, bt):
        return jnp.sum(
            fused_ffn(x, w1, b1, w2, b2, g, bt, SEED0, EPS, 0.0, True) * w
        )

    gs = jax.jit(jax.grad(loss_sh, argnums=tuple(range(7))))(
        x, w1, b1, w2, b2, g, bt
    )
    gp = jax.grad(loss_plain, argnums=tuple(range(7)))(x, w1, b1, w2, b2, g, bt)
    for a, b, name in zip(gs, gp, ["x", "w1", "b1", "w2", "b2", "g", "bt"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=name
        )


def test_fused_ffn_sharded_dropout_decorrelated():
    mesh = _mesh(4, 1)
    w1, b1, w2, b2, g, bt = _params()
    row = jnp.asarray(RNG.standard_normal((8, 64)), jnp.float32)
    x = jnp.tile(row, (4, 1))  # 4 shards × identical 8 rows
    out = jax.jit(
        lambda x: fused_ffn_sharded(
            x, w1, b1, w2, b2, g, bt, jnp.asarray(3, jnp.int32), EPS, 0.5,
            True, mesh=mesh,
        )
    )(x)
    out = np.asarray(out).reshape(4, 8, 64)
    assert not np.allclose(out[0], out[1])
    assert not np.allclose(out[1], out[2])


# ---------------------------------------------------------------------------
# Saved-intermediate training variant (fused_ffn_saved)
# ---------------------------------------------------------------------------

from vibertgrid_tpu.ops.fused_ffn import (  # noqa: E402
    fused_ffn_saved,
    fused_ffn_saved_sharded,
)


def test_fused_ffn_saved_forward_identical_to_fused():
    w1, b1, w2, b2, g, bt = _params()
    x = jnp.asarray(RNG.standard_normal((40, 64)), jnp.float32)  # pad path too
    seed = jnp.asarray(7, jnp.int32)
    for rate in (0.0, 0.5):
        got = fused_ffn_saved(x, w1, b1, w2, b2, g, bt, seed, EPS, rate, True)
        want = fused_ffn(x, w1, b1, w2, b2, g, bt, seed, EPS, rate, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6, err_msg=f"rate={rate}"
        )


def test_fused_ffn_saved_grads_match_reference():
    """The 4-GEMM no-remat backward == jax.grad through the XLA
    formulation, for all seven differentiable args, with and without
    dropout (fp32: the saved h1/yhat round-trips are exact)."""
    w1, b1, w2, b2, g, bt = _params()
    x = jnp.asarray(RNG.standard_normal((24, 64)), jnp.float32)
    w = jnp.asarray(RNG.standard_normal((24, 64)), jnp.float32)
    for rate in (0.0, 0.3):
        seed = jnp.asarray(11, jnp.int32)

        def loss_k(*args):
            return jnp.sum(
                fused_ffn_saved(*args, seed, EPS, rate, True) * w
            )

        def loss_r(*args):
            return jnp.sum(ffn_reference(*args, seed, EPS, rate) * w)

        gk = jax.grad(loss_k, argnums=tuple(range(7)))(
            x, w1, b1, w2, b2, g, bt
        )
        gr = jax.grad(loss_r, argnums=tuple(range(7)))(
            x, w1, b1, w2, b2, g, bt
        )
        for a, b, name in zip(gk, gr, ["x", "w1", "b1", "w2", "b2", "g", "bt"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5,
                err_msg=f"{name} rate={rate}",
            )


def test_fused_ffn_saved_sharded_matches_plain():
    mesh = _mesh(4, 1)
    w1, b1, w2, b2, g, bt = _params()
    x = jnp.asarray(RNG.standard_normal((32, 64)), jnp.float32)
    w = jnp.asarray(RNG.standard_normal((32, 64)), jnp.float32)

    def loss_sh(x, w1, b1, w2, b2, g, bt):
        return jnp.sum(
            fused_ffn_saved_sharded(
                x, w1, b1, w2, b2, g, bt, SEED0, EPS, 0.0, True, mesh=mesh
            )
            * w
        )

    def loss_plain(x, w1, b1, w2, b2, g, bt):
        return jnp.sum(
            fused_ffn_saved(x, w1, b1, w2, b2, g, bt, SEED0, EPS, 0.0, True)
            * w
        )

    gs = jax.jit(jax.grad(loss_sh, argnums=tuple(range(7))))(
        x, w1, b1, w2, b2, g, bt
    )
    gp = jax.grad(loss_plain, argnums=tuple(range(7)))(x, w1, b1, w2, b2, g, bt)
    for a, b, name in zip(gs, gp, ["x", "w1", "b1", "w2", "b2", "g", "bt"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=name
        )


def test_encoder_fused_saved_grads_match_xla():
    """ffn_impl='fused-saved' encoder: identical param tree, and the full
    training-pass (deterministic=False) gradient matches the einsum path's
    from the same variables. Dropout rates are zeroed so the two impls see
    the same function (the dropout-pattern identity is pinned per-kernel
    above); the gate still routes through fused_ffn_saved because the pass
    is non-deterministic."""
    from vibertgrid_tpu.models.bert import TextEncoder, TextEncoderConfig

    ids = jnp.asarray(RNG.integers(3, 500, (2, 40)), jnp.int32)
    mask = jnp.ones((2, 40), jnp.int32).at[:, 30:].set(0)
    cfg0 = dataclasses.replace(
        TextEncoderConfig.tiny(), ffn_impl="fused-saved",
        hidden_dropout=0.0, attention_dropout=0.0, attn_epilogue="xla",
    )
    enc_sv = TextEncoder(cfg0)
    enc_xla = TextEncoder(dataclasses.replace(cfg0, ffn_impl="xla"))
    variables = enc_xla.init(jax.random.PRNGKey(0), ids, mask)
    assert jax.tree_util.tree_structure(
        enc_sv.init(jax.random.PRNGKey(0), ids, mask)
    ) == jax.tree_util.tree_structure(variables)

    def loss(enc):
        return lambda v: jnp.sum(
            jnp.square(
                enc.apply(
                    v, ids, mask, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)},
                )
            )
        )

    gs = jax.grad(loss(enc_sv))(variables)
    gx = jax.grad(loss(enc_xla))(variables)
    for a, b in zip(
        jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gx)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        )


# ---------------------------------------------------------------------------
# Fused attention epilogue (fused_proj_ln)
# ---------------------------------------------------------------------------

from vibertgrid_tpu.ops.fused_ffn import (  # noqa: E402
    fused_proj_ln,
    fused_proj_ln_sharded,
    proj_ln_reference,
)


def _proj_params(d=64):
    w = jnp.asarray(RNG.standard_normal((d, d)) * 0.1, jnp.float32)
    b = jnp.asarray(RNG.standard_normal(d) * 0.1, jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(d), jnp.float32)
    bt = jnp.asarray(0.1 * RNG.standard_normal(d), jnp.float32)
    return w, b, g, bt


def _proj_flax_oracle(ctx, res, w, b, g, bt):
    """The einsum-path epilogue: out Dense -> residual -> LayerNorm."""
    import flax.linen as nn

    from vibertgrid_tpu.models.norm import LayerNorm

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, ctx, res):
            out = nn.Dense(w.shape[1], name="o")(ctx)
            return LayerNorm(epsilon=EPS, name="ln")(res + out)

    variables = {
        "params": {
            "o": {"kernel": w, "bias": b},
            "ln": {"scale": g, "bias": bt},
        }
    }
    return Tail().apply(variables, ctx, res)


def test_fused_proj_ln_forward_matches_flax_oracle():
    w, b, g, bt = _proj_params()
    ctx = jnp.asarray(RNG.standard_normal((24, 64)), jnp.float32)
    res = jnp.asarray(RNG.standard_normal((24, 64)), jnp.float32)
    got = fused_proj_ln(ctx, res, w, b, g, bt, SEED0, EPS, 0.0, True)
    want = _proj_flax_oracle(ctx, res, w, b, g, bt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_fused_proj_ln_nonmultiple_rows_pad_path():
    w, b, g, bt = _proj_params()
    ctx = jnp.asarray(RNG.standard_normal((13, 64)), jnp.float32)
    res = jnp.asarray(RNG.standard_normal((13, 64)), jnp.float32)
    got = fused_proj_ln(ctx, res, w, b, g, bt, SEED0, EPS, 0.0, True)
    want = proj_ln_reference(ctx, res, w, b, g, bt, SEED0, EPS, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_fused_proj_ln_grads_match_reference():
    w, b, g, bt = _proj_params()
    ctx = jnp.asarray(RNG.standard_normal((16, 64)), jnp.float32)
    res = jnp.asarray(RNG.standard_normal((16, 64)), jnp.float32)

    def loss_k(ctx, res, w, b, g, bt):
        return jnp.sum(
            jnp.sin(fused_proj_ln(ctx, res, w, b, g, bt, SEED0, EPS, 0.0, True))
        )

    def loss_r(ctx, res, w, b, g, bt):
        return jnp.sum(
            jnp.sin(proj_ln_reference(ctx, res, w, b, g, bt, SEED0, EPS, 0.0))
        )

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4, 5))(ctx, res, w, b, g, bt)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(ctx, res, w, b, g, bt)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-5)


def test_fused_proj_ln_dropout_pattern_matches_reference():
    w, b, g, bt = _proj_params()
    ctx = jnp.asarray(RNG.standard_normal((8, 64)), jnp.float32)
    res = jnp.asarray(RNG.standard_normal((8, 64)), jnp.float32)
    seed = jnp.asarray(77, jnp.int32)
    got = fused_proj_ln(ctx, res, w, b, g, bt, seed, EPS, 0.4, True)
    want = proj_ln_reference(ctx, res, w, b, g, bt, seed, EPS, 0.4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_fused_proj_ln_sharded_matches_single_device():
    w, b, g, bt = _proj_params()
    ctx = jnp.asarray(RNG.standard_normal((16, 64)), jnp.float32)
    res = jnp.asarray(RNG.standard_normal((16, 64)), jnp.float32)
    mesh = _mesh(4, 1)
    got = fused_proj_ln_sharded(
        ctx, res, w, b, g, bt, SEED0, EPS, 0.0, True, mesh=mesh
    )
    want = proj_ln_reference(ctx, res, w, b, g, bt, SEED0, EPS, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    # replicated-weight grads psum over shards
    def loss_s(w):
        return jnp.sum(
            fused_proj_ln_sharded(
                ctx, res, w, b, g, bt, SEED0, EPS, 0.0, True, mesh=mesh
            )
        )

    def loss_1(w):
        return jnp.sum(proj_ln_reference(ctx, res, w, b, g, bt, SEED0, EPS, 0.0))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_s)(w)),
        np.asarray(jax.grad(loss_1)(w)),
        atol=1e-5,
    )
