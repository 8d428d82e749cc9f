"""Pallas TPU kernel: fused self-attention for the BERT encoder.

The reference's transformer half runs through HF ``BertModel`` → cuDNN/cuBLAS
(`/root/reference/model/BERTgrid_generator.py:99-146`); its attention
materialises the ``[B, H, T, T]`` score/prob tensors in main memory. On TPU
that is pure HBM-bandwidth waste: at T=512 each encoder layer writes+reads
~100 MB of probabilities per batch. This kernel fuses
``scores → mask-bias → softmax → probs @ V`` into one VMEM-resident program
per (batch·head), so only Q/K/V/O ([T, D] each) ever touch HBM.

T here is the 510-token window length after [CLS]/[SEP] framing (≤ 512 —
``max_position_embeddings``), so a full [T, T] fp32 score tile fits in VMEM
comfortably (1 MB at T=512) and no online-softmax streaming is needed: the
win is fusion, not tiling. Inputs with T not a multiple of 128 are padded
with −1e9 key bias (zero attention weight) and the output is sliced back.

A custom VJP recomputes the probabilities in the backward kernel
(flash-style rematerialisation — scores are never stored between fwd and
bwd) and emits dQ/dK/dV plus the true mask-bias cotangent.

The XLA einsum path in :mod:`vibertgrid_tpu.models.bert` remains the oracle
in tests, the CPU fallback, and the path used when attention dropout is
active or attention heads are tensor-parallel-sharded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, sm_scale):
    """One (batch·head): out = softmax(q kᵀ · scale + bias) v, all in VMEM."""
    q = q_ref[0]  # [T, D]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * sm_scale + bias_ref[0]  # [1,T] bias broadcasts over [T,T]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref, db_ref, *, sm_scale
):
    """One (batch·head): rematerialise p, then dq/dk/dv/d_bias."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * sm_scale + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [T, T] fp32

    # softmax VJP: ds = p ⊙ (dp − rowsum(dp ⊙ p))
    dp = jax.lax.dot_general(
        do,
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)  # fp32 [T, T]

    dq_ref[0] = (
        jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32) * sm_scale
    ).astype(dq_ref.dtype)
    dk_ref[0] = (
        jax.lax.dot_general(
            ds.astype(q.dtype),
            q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * sm_scale
    ).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype),
        do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    db_ref[0] = jnp.sum(ds, axis=0, keepdims=True).astype(db_ref.dtype)


def _pad_inputs(q, k, v, bias):
    """Pad T up to a lane-aligned multiple of 128; padded keys get −1e9 bias."""
    t = q.shape[2]
    tp = _round_up(t, 128)
    if tp == t:
        return q, k, v, bias, t
    pad = [(0, 0), (0, 0), (0, tp - t), (0, 0)]
    q = jnp.pad(q, pad)
    k = jnp.pad(k, pad)
    v = jnp.pad(v, pad)
    bias = jnp.pad(bias, [(0, 0), (0, tp - t)], constant_values=-1e9)
    return q, k, v, bias, t


def _specs(h, tp, d):
    """Shared pallas_call layout: grid (B·H,), [B·H, T, D] blocks + bias."""
    # bias rides as [B, 1, T]: TPU blocks need their last two dims either
    # 8/128-aligned or equal to the array dims, so the head-broadcast axis
    # becomes an explicit singleton.
    qkv_spec = pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(
        (1, 1, tp), lambda i: (i // h, 0, 0), memory_space=pltpu.VMEM
    )
    return qkv_spec, bias_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, bias, sm_scale, interpret=False):
    """Fused multi-head attention: ``softmax(q kᵀ · sm_scale + bias) v``.

    q/k/v: [B, H, T, D]; bias: [B, T] additive fp32 key mask (0 or −1e9),
    broadcast over heads and queries. Returns [B, H, T, D] in q's dtype.
    """
    out, _ = _flash_attention_fwd(q, k, v, bias, sm_scale, interpret)
    return out


def _flash_attention_fwd(q, k, v, bias, sm_scale, interpret):
    b, h, t, d = q.shape
    qp, kp, vp, biasp, _ = _pad_inputs(q, k, v, bias.astype(jnp.float32))
    tp = qp.shape[2]
    qkv_spec, bias_spec = _specs(h, tp, d)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale),
        grid=(b * h,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, tp, d), q.dtype),
        interpret=interpret,
    )(
        qp.reshape(b * h, tp, d),
        kp.reshape(b * h, tp, d),
        vp.reshape(b * h, tp, d),
        biasp[:, None, :],
    )
    out = out.reshape(b, h, tp, d)[:, :, :t]
    return out, (q, k, v, bias)


def _flash_attention_bwd(sm_scale, interpret, residuals, g):
    q, k, v, bias = residuals
    b, h, t, d = q.shape
    qp, kp, vp, biasp, _ = _pad_inputs(q, k, v, bias.astype(jnp.float32))
    gp = _pad_inputs(g, g, g, bias.astype(jnp.float32))[0]
    tp = qp.shape[2]
    qkv_spec, bias_spec = _specs(h, tp, d)
    db_spec = pl.BlockSpec(
        (1, 1, tp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale),
        grid=(b * h,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec, db_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, tp, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, tp, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, tp, d), v.dtype),
            jax.ShapeDtypeStruct((b * h, 1, tp), jnp.float32),
        ),
        interpret=interpret,
    )(
        qp.reshape(b * h, tp, d),
        kp.reshape(b * h, tp, d),
        vp.reshape(b * h, tp, d),
        biasp[:, None, :],
        gp.reshape(b * h, tp, d),
    )
    unpad = lambda x: x.reshape(b, h, tp, d)[:, :, :t]
    d_bias = db.reshape(b, h, tp)[:, :, :t].sum(axis=1).astype(bias.dtype)
    return unpad(dq), unpad(dk), unpad(dv), d_bias


flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)
