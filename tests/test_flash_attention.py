"""Fused packed-head Pallas attention vs the XLA einsum oracle (interpret
mode on CPU).

Covers forward parity, gradient parity through the custom VJP (including the
mask-bias cotangent), non-128-multiple sequence lengths (padding path),
odd head-group packings, and the encoder-level impl switch.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vibertgrid_tpu.ops.flash_attention import flash_attention

RNG = np.random.default_rng(11)
SEED0 = jnp.zeros((), jnp.int32)


def _inputs(b=2, h=3, t=200, d=32):
    q = RNG.standard_normal((b, t, h * d)).astype(np.float32)
    k = RNG.standard_normal((b, t, h * d)).astype(np.float32)
    v = RNG.standard_normal((b, t, h * d)).astype(np.float32)
    mask = RNG.random((b, t)) > 0.25
    mask[:, :2] = True  # at least some real keys per row
    bias = np.where(mask, 0.0, -1e9).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias)


def _oracle(q, k, v, bias, sm_scale, h):
    b, t, m = q.shape
    d = m // h
    qh, kh, vh = (
        x.reshape(b, t, h, d).transpose(0, 2, 1, 3) for x in (q, k, v)
    )
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * sm_scale
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return ctx.transpose(0, 2, 1, 3).reshape(b, t, m)


def test_flash_attention_forward_matches_oracle():
    q, k, v, bias = _inputs()
    sm_scale = 1.0 / np.sqrt(32)
    got = flash_attention(q, k, v, bias, SEED0, sm_scale, 3, 0.0, True)
    want = _oracle(q, k, v, bias, sm_scale, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_attention_forward_aligned_t_grouped_heads():
    # d=64, h=4 → two heads per program (lane-aligned packing)
    q, k, v, bias = _inputs(h=4, t=128, d=64)
    got = flash_attention(q, k, v, bias, SEED0, 0.125, 4, 0.0, True)
    want = _oracle(q, k, v, bias, 0.125, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_attention_grads_match_oracle():
    q, k, v, bias = _inputs(b=1, h=2, t=96, d=16)
    sm_scale = 0.25
    w = jnp.asarray(RNG.standard_normal((1, 96, 32)).astype(np.float32))

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias, SEED0, sm_scale, 2, 0.0, True) * w)

    def loss_oracle(q, k, v, bias):
        return jnp.sum(_oracle(q, k, v, bias, sm_scale, 2) * w)

    got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for g, wv, name in zip(got, want, "qkvb"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wv), atol=3e-5, err_msg=f"d{name}"
        )


def test_encoder_flash_switch_matches_xla():
    """TextEncoder output is identical (within fp32 tolerance) whichever
    attention impl is selected."""
    import dataclasses

    from vibertgrid_tpu.models.bert import TextEncoder, TextEncoderConfig

    cfg = TextEncoderConfig.tiny()
    ids = jnp.asarray(RNG.integers(3, 500, (2, 40)), jnp.int32)
    mask = jnp.ones((2, 40), jnp.int32).at[:, 30:].set(0)

    enc_xla = TextEncoder(dataclasses.replace(cfg, attention_impl="xla"))
    variables = enc_xla.init(jax.random.PRNGKey(0), ids, mask)
    out_xla = enc_xla.apply(variables, ids, mask)

    enc_flash = TextEncoder(dataclasses.replace(cfg, attention_impl="flash"))
    out_flash = enc_flash.apply(variables, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=3e-5
    )


def test_flash_attention_dropout_deterministic_and_consistent():
    """Same seed → identical output; fwd and bwd regenerate the same mask
    (validated by finite differences through the custom VJP)."""
    q, k, v, bias = _inputs(b=1, h=2, t=64, d=16)
    seed = jnp.asarray(1234, jnp.int32)
    rate = 0.5

    out1 = flash_attention(q, k, v, bias, seed, 0.25, 2, rate, True)
    out2 = flash_attention(q, k, v, bias, seed, 0.25, 2, rate, True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    # a different seed must change the mask
    out3 = flash_attention(q, k, v, bias, seed + 1, 0.25, 2, rate, True)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))

    # finite differences: valid only if bwd reproduces the identical mask
    w = jnp.asarray(RNG.standard_normal(out1.shape).astype(np.float32))

    def loss(q):
        return jnp.sum(flash_attention(q, k, v, bias, seed, 0.25, 2, rate, True) * w)

    g = jax.grad(loss)(q)
    eps = 1e-3
    for idx in [(0, 3, 5), (0, 40, 17), (0, 63, 31)]:
        dq = jnp.zeros_like(q).at[idx].set(eps)
        fd = (loss(q + dq) - loss(q - dq)) / (2 * eps)
        np.testing.assert_allclose(
            float(g[idx]), float(fd), rtol=2e-2, atol=1e-3, err_msg=str(idx)
        )


def test_flash_attention_dropout_preserves_expectation():
    """E[dropped attention] ≈ undropped (inverted-scale keep mask)."""
    q, k, v, bias = _inputs(b=2, h=2, t=128, d=32)
    base = flash_attention(q, k, v, bias, SEED0, 0.2, 2, 0.0, True)
    acc = jnp.zeros_like(base)
    n = 8
    for i in range(n):
        acc = acc + flash_attention(
            q, k, v, bias, jnp.asarray(7 + i, jnp.int32), 0.2, 2, 0.25, True
        )
    mean = np.asarray(acc / n)
    corr = np.corrcoef(mean.ravel(), np.asarray(base).ravel())[0, 1]
    assert corr > 0.95, corr


# ---------------------------------------------------------------------------
# Multi-device: the shard_map wrapper (batch on data, heads on model).
# ---------------------------------------------------------------------------


def _mesh(data, model):
    from jax.sharding import Mesh

    return Mesh(
        np.array(jax.devices()[: data * model]).reshape(data, model),
        ("data", "model"),
    )


def test_flash_attention_sharded_forward_matches_oracle():
    """(4 data × 2 model) mesh, jitted with sharded inputs, padding path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vibertgrid_tpu.ops.flash_attention import flash_attention_sharded

    mesh = _mesh(4, 2)
    q, k, v, bias = _inputs(b=8, h=4, t=160, d=64)
    sm_scale = 0.125
    qs, ks, vs = (
        jax.device_put(x, NamedSharding(mesh, P("data", None, "model")))
        for x in (q, k, v)
    )
    bs = jax.device_put(bias, NamedSharding(mesh, P("data", None)))

    @jax.jit
    def run(q, k, v, bias):
        return flash_attention_sharded(
            q, k, v, bias, SEED0, sm_scale, 4, 0.0, True, mesh=mesh
        )

    got = run(qs, ks, vs, bs)
    want = _oracle(q, k, v, bias, sm_scale, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_attention_sharded_grads_match_unsharded():
    from vibertgrid_tpu.ops.flash_attention import flash_attention_sharded

    mesh = _mesh(4, 2)
    q, k, v, bias = _inputs(b=4, h=2, t=96, d=64)
    w = jnp.asarray(RNG.standard_normal(q.shape).astype(np.float32))

    def loss_plain(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, SEED0, 0.2, 2, 0.0, True) * w)

    def loss_sharded(q, k, v):
        return jnp.sum(
            flash_attention_sharded(
                q, k, v, bias, SEED0, 0.2, 2, 0.0, True, mesh=mesh
            )
            * w
        )

    g_plain = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    g_sharded = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(g_plain, g_sharded, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=f"d{name}"
        )


def test_flash_attention_sharded_dropout_decorrelated_across_shards():
    """Identical rows placed on different data shards must draw different
    dropout masks (the wrapper folds the shard index into the seed —
    in-kernel program ids restart at 0 on every shard)."""
    from vibertgrid_tpu.ops.flash_attention import flash_attention_sharded

    mesh = _mesh(4, 1)
    q, k, v, bias = _inputs(b=1, h=2, t=64, d=64)
    rep = lambda x: jnp.broadcast_to(x, (4,) + x.shape[1:])
    out = jax.jit(
        lambda q, k, v, bias: flash_attention_sharded(
            q, k, v, bias, jnp.asarray(7, jnp.int32), 0.25, 2, 0.5, True,
            mesh=mesh,
        )
    )(rep(q), rep(k), rep(v), rep(bias))
    out = np.asarray(out)
    # rows 0..3 are local-row-0 of shards 0..3: without decorrelation all
    # four would be identical
    assert not np.allclose(out[0], out[1])
    assert not np.allclose(out[0], out[2])
    assert not np.allclose(out[1], out[3])


def test_encoder_sharded_flash_matches_xla():
    """TextEncoder with a (2, 2) mesh + forced flash path == einsum path."""
    import dataclasses

    from vibertgrid_tpu.models.bert import TextEncoder, TextEncoderConfig

    cfg = TextEncoderConfig.tiny()  # 4 heads, d=16
    ids = jnp.asarray(RNG.integers(3, 500, (4, 40)), jnp.int32)
    mask = jnp.ones((4, 40), jnp.int32).at[:, 30:].set(0)

    enc_xla = TextEncoder(dataclasses.replace(cfg, attention_impl="xla"))
    variables = enc_xla.init(jax.random.PRNGKey(0), ids, mask)
    out_xla = enc_xla.apply(variables, ids, mask)

    enc_sharded = TextEncoder(
        dataclasses.replace(cfg, attention_impl="flash", mesh=_mesh(2, 2))
    )
    out_sharded = jax.jit(
        lambda v, i, m: enc_sharded.apply(v, i, m)
    )(variables, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_xla), atol=3e-5
    )
