"""Pallas TPU kernel: fused self-attention for the BERT encoder.

The reference's transformer half runs through HF ``BertModel`` → cuDNN/cuBLAS
(`/root/reference/model/BERTgrid_generator.py:99-146`); its attention
materialises the ``[B, H, T, T]`` score/prob tensors in main memory. On TPU
that is pure HBM-bandwidth waste: at T=512 each encoder layer writes+reads
~100 MB of probabilities per batch. This kernel fuses
``scores → mask-bias → softmax → probs @ V`` into one VMEM-resident program,
so only Q/K/V/O ever touch HBM.

Layout: the kernel consumes Q/K/V **packed** as ``[B, T, H·D]`` — the natural
output of the projection matmuls — and emits the context in the same layout.
Heads are separated by static in-kernel slices (``G = 128/D`` heads per grid
program keeps blocks lane-aligned), so the six ``[B,T,H,D] ↔ [B,H,T,D]``
transposes per layer that a head-major attention needs never exist at all.

T here is the 510-token window length after [CLS]/[SEP] framing (≤ 512 —
``max_position_embeddings``), so a full [T, T] fp32 score tile fits in VMEM
comfortably (1 MB at T=512) and no online-softmax streaming is needed: the
win is fusion, not tiling. Inputs with T not a multiple of 128 are padded
with −1e9 key bias (zero attention weight) and the output is sliced back.

A custom VJP recomputes the probabilities in the backward kernel
(flash-style rematerialisation — scores are never stored between fwd and
bwd) and emits dQ/dK/dV plus the true mask-bias cotangent.

Attention-probability dropout (the reference trains with rate 0.1 via HF's
``attention_probs_dropout_prob``) runs **inside** the kernel from a
stateless counter-based hash of (seed, program, head, element): the keep
mask is never materialised in HBM, and the backward kernel reproduces the
identical mask by construction (it hashes the same indices).

The XLA einsum path in :mod:`vibertgrid_tpu.models.bert` remains the oracle
in tests, the CPU fallback, and the path used when attention heads are
tensor-parallel-sharded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _heads_per_program(
    num_heads: int, d_head: int, batch: int = 1, itemsize: int = 2
) -> int:
    """Heads per grid program: lane-aligned packed width, sized so the grid
    keeps ≥16 programs for pipeline overlap.

    Larger groups amortise per-program overhead (measured: BERT-base bs16
    0.398→0.357 ms/call going from G=2 to G=6) but too few programs starve
    the Mosaic pipeline (bs8 G=12 is slower than G=6), and the backward
    kernel's working set (4 packed [T, G·D] blocks + 3 outputs + the fp32
    [T, T] intermediates) overflows the 16 MB scoped VMEM above
    ``G·D·itemsize = 768`` bytes of packed width at T=512 — measured as
    G·D = 384 in bf16, and a compile-time "scoped vmem limit exceeded"
    at the same G·D in fp32 (amp: False), hence the dtype-aware cap.
    The largest aligned divisor under the cap with ``batch ·
    num_heads / G ≥ 16`` picks the measured best at both batch sizes; fall
    back to the smallest aligned group."""
    cap = 384 * 2 // itemsize
    divisors = [g for g in range(1, num_heads + 1) if num_heads % g == 0]
    lane_aligned = [g for g in divisors if (g * d_head) % 128 == 0]
    aligned = [g for g in lane_aligned if g * d_head <= cap]
    if not aligned:
        # nothing fits the VMEM cap: the smallest lane-aligned group is the
        # least-VMEM choice (never num_heads — that maximises the overflow)
        return min(lane_aligned) if lane_aligned else num_heads
    big = [g for g in aligned if batch * num_heads // g >= 16]
    return max(big) if big else min(aligned)


def _dropout_mask(seed, shape, rate):
    """Keep-mask ⊙ 1/(1-rate), from a stateless splitmix32-style hash of
    (seed, element index). Callers fold program/head ids into ``seed``.

    Counter-based rather than the stateful per-core PRNG so that (a) the
    backward kernel reproduces the identical mask by construction — it hashes
    the same indices — and (b) the same code runs under interpret mode on CPU
    (``pltpu.prng_seed`` has no CPU lowering)."""
    from vibertgrid_tpu.ops.dropout import splitmix32

    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = splitmix32(rows * jnp.uint32(shape[1]) + cols, seed)
    threshold = jnp.uint32(int(rate * float(2**32)))
    return jnp.where(x >= threshold, 1.0 / (1.0 - rate), 0.0)


def _fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, seed_ref, out_ref, *, sm_scale, heads, d, rate
):
    """One (batch · head-group): for each packed head, softmax(qkᵀ+bias)v."""
    bias = bias_ref[0]  # [1, T]
    seed = seed_ref[0, 0]
    pid = pl.program_id(0)
    for g in range(heads):
        sl = slice(g * d, (g + 1) * d)
        q = q_ref[0][:, sl]  # [T, D]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * sm_scale + bias  # [T, T] fp32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            p = p * _dropout_mask(seed + pid * heads + g, p.shape, rate)
        out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        out_ref[0, :, sl] = out.astype(out_ref.dtype)


def _bwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    seed_ref,
    do_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    db_ref,
    *,
    sm_scale,
    heads,
    d,
    rate,
):
    """One (batch · head-group): rematerialise p (and the identical dropout
    mask — same seed, same draw order), then dq/dk/dv/d_bias."""
    bias = bias_ref[0]
    db_acc = jnp.zeros_like(bias)
    seed = seed_ref[0, 0]
    pid = pl.program_id(0)
    for g in range(heads):
        sl = slice(g * d, (g + 1) * d)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        do = do_ref[0][:, sl]
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * sm_scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # [T, T] fp32
        if rate > 0.0:
            keep = _dropout_mask(seed + pid * heads + g, p.shape, rate)
            p_dropped = p * keep
        else:
            p_dropped = p

        # out = P̃ v with P̃ = keep ⊙ p: dv uses P̃, softmax VJP uses
        # dp = keep ⊙ (do vᵀ); then ds = p ⊙ (dp − rowsum(dp ⊙ p)).
        dp = jax.lax.dot_general(
            do,
            v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            dp = dp * keep
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)  # fp32 [T, T]

        dq_ref[0, :, sl] = (
            jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)
            * sm_scale
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = (
            jax.lax.dot_general(
                ds.astype(q.dtype),
                q,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        ).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            p_dropped.astype(do.dtype),
            do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        db_acc = db_acc + jnp.sum(ds, axis=0, keepdims=True)
    db_ref[0] = db_acc.astype(db_ref.dtype)


def _vma(*xs) -> frozenset:
    """Union of the inputs' varying-mesh-axes (non-empty only under
    ``shard_map``). ``pallas_call`` does not infer vma for its outputs the
    way regular ops do, so the callers thread this into ``out_shape``."""
    out: frozenset = frozenset()
    for x in xs:
        out = out | getattr(jax.typeof(x), "vma", frozenset())
    return out


def _struct(shape, dtype, vma):
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _pad_t(x, tp, value=0.0):
    t = x.shape[1]
    if tp == t:
        return x
    return jnp.pad(
        x, [(0, 0), (0, tp - t)] + [(0, 0)] * (x.ndim - 2), constant_values=value
    )


def _specs(groups_per_batch, tp, width):
    """pallas_call layout: grid (B · H/G,), packed [B, T, H·D] blocks + bias."""
    qkv_spec = pl.BlockSpec(
        (1, tp, width),
        lambda i: (i // groups_per_batch, 0, i % groups_per_batch),
        memory_space=pltpu.VMEM,
    )
    # bias rides as [B, 1, T]: TPU blocks need their last two dims either
    # 8/128-aligned or equal to the array dims, so the broadcast axis becomes
    # an explicit singleton.
    bias_spec = pl.BlockSpec(
        (1, 1, tp),
        lambda i: (i // groups_per_batch, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return qkv_spec, bias_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def flash_attention(q, k, v, bias, seed, sm_scale, num_heads, rate=0.0,
                    interpret=False):
    """Fused multi-head attention on packed heads.

    q/k/v: ``[B, T, H·D]`` (projection-matmul layout — no head transpose);
    bias: ``[B, T]`` additive fp32 key mask (0 or −1e9), broadcast over heads
    and queries; seed: ``[]``/``[1,1]`` int32 PRNG seed for attention-prob
    dropout (ignored when ``rate == 0``). ``rate`` is the static dropout
    rate. Returns ``[B, T, H·D]`` in q's dtype.
    """
    out, _ = _flash_attention_fwd(q, k, v, bias, seed, sm_scale, num_heads,
                                  rate, interpret)
    return out


def _call_geometry(q, num_heads):
    b, t, m = q.shape
    assert m % num_heads == 0, (m, num_heads)
    d = m // num_heads
    g = _heads_per_program(num_heads, d, batch=b, itemsize=q.dtype.itemsize)
    tp = _round_up(t, 128)
    return b, t, m, d, g, tp


def _seed_spec():
    return pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)


def _flash_attention_fwd(q, k, v, bias, seed, sm_scale, num_heads, rate,
                         interpret):
    b, t, m, d, g, tp = _call_geometry(q, num_heads)
    groups = num_heads // g
    qp = _pad_t(q, tp)
    kp = _pad_t(k, tp)
    vp = _pad_t(v, tp)
    biasp = _pad_t(bias.astype(jnp.float32), tp, -1e9)
    seed2d = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    qkv_spec, bias_spec = _specs(groups, tp, g * d)
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, heads=g, d=d, rate=rate
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * groups,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, _seed_spec()],
        out_specs=qkv_spec,
        out_shape=_struct((b, tp, m), q.dtype, _vma(qp, kp, vp, biasp)),
        interpret=interpret,
    )(qp, kp, vp, biasp[:, None, :], seed2d)
    return out[:, :t], (q, k, v, bias, seed)


def _flash_attention_bwd(sm_scale, num_heads, rate, interpret, residuals,
                         grad):
    q, k, v, bias, seed = residuals
    b, t, m, d, g, tp = _call_geometry(q, num_heads)
    groups = num_heads // g
    qp = _pad_t(q, tp)
    kp = _pad_t(k, tp)
    vp = _pad_t(v, tp)
    gp = _pad_t(grad, tp)
    biasp = _pad_t(bias.astype(jnp.float32), tp, -1e9)
    seed2d = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    qkv_spec, bias_spec = _specs(groups, tp, g * d)
    db_spec = pl.BlockSpec(
        (1, 1, tp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _bwd_kernel, sm_scale=sm_scale, heads=g, d=d, rate=rate
    )
    vma = _vma(qp, kp, vp, biasp, gp)
    dq, dk, dv, db = pl.pallas_call(
        kernel,
        grid=(b * groups,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, _seed_spec(),
                  qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec, db_spec),
        out_shape=(
            _struct((b, tp, m), q.dtype, vma),
            _struct((b, tp, m), k.dtype, vma),
            _struct((b, tp, m), v.dtype, vma),
            _struct((b * groups, 1, tp), jnp.float32, vma),
        ),
        interpret=interpret,
    )(qp, kp, vp, biasp[:, None, :], seed2d, gp)
    d_bias = (
        db.reshape(b, groups, tp)[:, :, :t].sum(axis=1).astype(bias.dtype)
    )
    # Under shard_map with heads sharded (vma carries a mesh axis the bias
    # does not vary over), each shard saw only its local head group: the true
    # bias cotangent is the sum over that axis.
    extra = vma - _vma(bias)
    if extra:
        d_bias = jax.lax.psum(d_bias, tuple(sorted(extra)))
    d_seed = np.zeros(jnp.shape(seed), dtype=jax.dtypes.float0)
    return dq[:, :t], dk[:, :t], dv[:, :t], d_bias, d_seed


flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention_sharded(
    q,
    k,
    v,
    bias,
    seed,
    sm_scale,
    num_heads,
    rate=0.0,
    interpret=False,
    *,
    mesh,
    data_axis="data",
    model_axis="model",
):
    """:func:`flash_attention` under a multi-device mesh.

    GSPMD cannot partition a ``pallas_call``, but the kernel's grid is
    embarrassingly parallel over (batch · head group): this wrapper runs it
    per-shard via ``shard_map`` with the canonical Megatron placement — batch
    on ``data``, heads on ``model`` (matching ``parallel.sharding``'s QKV
    output-dim split, so the kernel consumes the TP-sharded projection
    outputs with no resharding and its output feeds the input-dim-sharded
    out-projection directly). Gradients flow through the kernel's custom VJP
    per shard; the bias cotangent is psum'd over ``model`` (each shard only
    sees its local head group).

    Requirements: ``num_heads`` divisible by the ``model`` axis size, batch
    divisible by the ``data`` axis size. Callers fall back to the XLA einsum
    path when these don't hold (see ``models/bert.py``).

    ``check_vma=False``: the interpret-mode pallas lowering (the CPU test
    path) cannot propagate varying-mesh-axis metadata through its block-fetch
    loop, and with checking off the replicated-``bias`` cotangent would come
    back unreduced over ``model`` — so the wrapper stops the bias gradient
    instead. The bias is an additive rendering of the attention mask (derived
    from integer token ids) and carries no gradient in this model; the
    unsharded :func:`flash_attention` still returns the true bias cotangent.
    """
    dp = mesh.shape[data_axis]
    mp = mesh.shape[model_axis]
    b = q.shape[0]
    assert num_heads % mp == 0, (num_heads, mp)
    assert b % dp == 0, (b, dp)
    bias = jax.lax.stop_gradient(bias)

    def local(q, k, v, bias, seed):
        if rate > 0.0:
            # Kernel program ids restart at 0 on every shard: decorrelate the
            # in-kernel dropout streams by folding the shard index into the
            # seed (wrapping int32 add — splitmix only needs distinctness).
            shard = (
                jax.lax.axis_index(data_axis) * mp
                + jax.lax.axis_index(model_axis)
            )
            seed = seed + shard.astype(jnp.int32) * jnp.int32(2**16)
        return flash_attention(
            q, k, v, bias, seed, sm_scale, num_heads // mp, rate, interpret
        )

    qkv = jax.sharding.PartitionSpec(data_axis, None, model_axis)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            qkv,
            qkv,
            qkv,
            jax.sharding.PartitionSpec(data_axis, None),
            jax.sharding.PartitionSpec(),
        ),
        out_specs=qkv,
        check_vma=False,
    )(q, k, v, bias, seed)
