"""Pallas TPU kernel: fused transformer FFN tail.

One VMEM-resident program computes, per row tile,

    LayerNorm(x + dropout(gelu(x @ W1 + b1) @ W2 + b2))

— the entire FFN half of a BERT encoder layer (reference: HF ``BertLayer``'s
intermediate/output modules, driven from
``/root/reference/model/BERTgrid_generator.py:99-146``; our XLA twin is the
tail of ``models/bert.EncoderLayer``).

Why: the XLA path materialises the ``[N, 4D]`` intermediate in HBM between
the two GEMMs (write + read ≈ 100 MB/layer at bench shapes) and runs the
gelu / dropout / residual / LayerNorm elementwise phases as separate
HBM-bound passes serialized between the MXU GEMMs — the per-component table
in docs/ARCHITECTURE.md shows the encoder carrying ~45% slack over
max(HBM, MXU) ideal from exactly this phase alternation. In the kernel the
intermediate lives only in VMEM and every elementwise op happens on
registers between the two dots: HBM sees x once in, the normalized output
once out, and the weights once per call.

Numerics: both dots accumulate fp32 (``preferred_element_type``); gelu is
the exact (erf) form computed in fp32 via the same rational polynomial XLA
lowers f32 erf to (Mosaic has no erf primitive — see ``_erf_f32``);
LayerNorm uses fp32 E[x²]−E[x]²
statistics exactly like ``models/norm.LayerNorm``. Dropout is the same
counter-based splitmix32 hash of (seed, global flat index) as
:mod:`vibertgrid_tpu.ops.dropout` — bit-identical keep decisions to
``hash_dropout`` on the ``[N, D]`` output, which the backward pass relies
on.

Backward: a custom VJP recomputes the forward **in XLA** (the reference
formulation below) and differentiates that — flash-style rematerialisation
at the layer level. The fwd kernel's byte savings are kept; the bwd graph
is the standard GSPMD-partitionable XLA one; the dropout mask regenerates
identically from the seed in both.

TP caveat: under a ``model``-sharded mesh the FFN weights are split on the
intermediate dim and the partial outputs need a psum *before* the residual
+ LN — the fusion boundary. The encoder therefore uses this kernel only
when the model axis is 1 (single device or pure data parallel); tensor
parallelism keeps the einsum path (see ``models/bert.EncoderLayer``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vibertgrid_tpu.ops.dropout import splitmix32


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _erf_f32(x):
    """fp32 erf as the x·P(x²)/Q(x²) rational minimax XLA itself emits
    (Eigen's ``generic_fast_erf_float``; max |err| vs ``jax.lax.erf`` ≈
    6e-7, measured over [-8, 8]).

    Mosaic has no ``erf`` lowering (``NotImplementedError: Unimplemented
    primitive ... erf``, hit compiled-on-chip 2026-08-19 — interpret mode
    accepted it, exactly the failure class tools/tpu_smoke.py exists for),
    so the kernel needs an in-kernel formulation; using the same
    polynomial in :func:`ffn_reference` keeps the kernel, the backward
    rematerialisation, and the interpret-mode tests bit-identical.
    """
    x = jnp.clip(x, -3.832506856900711, 3.832506856900711)
    z = x * x
    a = jnp.float32(-2.72614225801306e-10)
    for c in (2.77068142495902e-08, -2.10102402082508e-06,
              -5.69250639462346e-05, -7.34990630326855e-04,
              -2.95459980854025e-03, -1.60960333262415e-02):
        a = a * z + jnp.float32(c)
    a = a * x
    b = jnp.float32(-1.45660718464996e-05)
    for c in (-2.13374055278905e-04, -1.68282697438203e-03,
              -7.37332916720468e-03, -1.42647390514189e-02):
        b = b * z + jnp.float32(c)
    return a / b


def _gelu_exact_f32(x):
    # jax.nn.gelu(approximate=False) in fp32: 0.5 x (1 + erf(x / sqrt(2)))
    # with erf via the Mosaic-lowerable polynomial (see _erf_f32).
    return 0.5 * x * (1.0 + _erf_f32(x * np.float32(1.0 / np.sqrt(2.0))))


def ffn_reference(x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps, rate):
    """XLA formulation the kernel fuses (and the VJP differentiates).

    ``x``: [N, D] in the compute dtype; weights/biases/LN params fp32
    (cast like flax ``Dense(dtype=...)`` does). Matches the pre-kernel
    ``EncoderLayer`` tail op-for-op, with fp32 dot accumulation.
    """
    dt = x.dtype
    inter = (
        jnp.dot(x, w1.astype(dt), preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32)
    )
    inter = _gelu_exact_f32(inter).astype(dt)
    out = (
        jnp.dot(inter, w2.astype(dt), preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32)
    )
    if rate > 0.0:
        n = out.size
        bits = splitmix32(
            jax.lax.iota(jnp.uint32, n).reshape(out.shape), seed
        )
        threshold = jnp.uint32(int(rate * float(2**32)))
        out = jnp.where(bits >= threshold, out / (1.0 - rate), 0.0)
    res = x.astype(jnp.float32) + out
    mean = jnp.mean(res, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(res), axis=-1, keepdims=True) - jnp.square(mean)
    y = (res - mean) * jax.lax.rsqrt(var + eps)
    return (y * ln_scale + ln_bias).astype(dt)


def _ffn_kernel(
    x_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    g_ref,
    bt_ref,
    seed_ref,
    out_ref,
    *,
    eps,
    rate,
    rows,
    d,
):
    x = x_ref[...]  # [R, D] compute dtype
    inter = (
        jax.lax.dot_general(
            x,
            w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[...]
    )
    inter = _gelu_exact_f32(inter).astype(x.dtype)
    out = (
        jax.lax.dot_general(
            inter,
            w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[...]
    )  # [R, D] fp32
    if rate > 0.0:
        pid = pl.program_id(0)
        seed = seed_ref[0, 0]
        r = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 0)
        c = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 1)
        flat = (pid.astype(jnp.uint32) * jnp.uint32(rows) + r) * jnp.uint32(
            d
        ) + c
        bits = splitmix32(flat, seed)
        threshold = jnp.uint32(int(rate * float(2**32)))
        out = jnp.where(bits >= threshold, out / (1.0 - rate), 0.0)
    res = x.astype(jnp.float32) + out
    mean = jnp.mean(res, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(res), axis=-1, keepdims=True) - jnp.square(mean)
    y = (res - mean) * jax.lax.rsqrt(var + eps)
    out_ref[...] = (y * g_ref[...] + bt_ref[...]).astype(out_ref.dtype)


def _row_tile(n: int, d: int, f: int, itemsize: int) -> int | None:
    """Largest row tile keeping the working set under the VMEM budget, capped
    at the (padded) row count; ``None`` when nothing fits — fp32 BERT-base
    weight blocks alone are 18.9 MB, over the 16 MB scoped VMEM, and an
    infeasible tile would die in Mosaic compilation on the real chip (the
    same failure class the attention kernel's dtype-aware head cap fixes).

    Resident per program: W1 + W2 (constant blocks, itemsize), the fp32
    [R, F] intermediate (the dominant per-row term), x/out [R, D], and
    fp32 [R, D] temporaries. Target ≤ ~13 MB of the 16 MB scoped VMEM.
    """
    budget = 13 * 2**20
    weights = 2 * d * f * itemsize
    per_row = f * 4 + f * itemsize + d * itemsize * 2 + d * 4 * 2
    cap = max(_round_up(n, 8), 8)
    for r in (512, 256, 128, 64, 32, 16, 8):
        if r <= cap and weights + r * per_row <= budget:
            return r
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_ffn(x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps, rate=0.0,
              interpret=False):
    """Fused GEMM→gelu→GEMM→dropout→residual→LayerNorm.

    ``x``: [N, D] compute-dtype rows (callers fold [B, T, D] to 2-D; the
    dropout indexing matches ``hash_dropout`` on the same array). Weights,
    biases and LN params are the fp32 flax param leaves. ``seed``: scalar
    int32 (ignored when ``rate == 0``). Returns [N, D] in ``x.dtype``.
    """
    out, _ = _fused_ffn_fwd(x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps,
                            rate, interpret)
    return out


def _fused_ffn_fwd(x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps, rate,
                   interpret):
    n, d = x.shape
    f = w1.shape[1]
    dt = x.dtype
    r = _row_tile(n, d, f, dt.itemsize)
    if r is None:
        # No feasible tile (e.g. fp32 compute dtype at BERT-base widths):
        # run the XLA formulation — the backward uses it regardless, so the
        # custom VJP stays consistent.
        out = ffn_reference(x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps,
                            rate)
        return out, (x, w1, b1, w2, b2, ln_scale, ln_bias, seed)
    np_rows = _round_up(n, r)
    xp = jnp.pad(x, ((0, np_rows - n), (0, 0))) if np_rows != n else x

    row_spec = pl.BlockSpec((r, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_ffn_kernel, eps=eps, rate=rate, rows=r, d=d)
    out = pl.pallas_call(
        kernel,
        grid=(np_rows // r,),
        in_specs=[
            row_spec,
            const((d, f)),
            const((1, f)),
            const((f, d)),
            const((1, d)),
            const((1, d)),
            const((1, d)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((np_rows, d), dt),
        interpret=interpret,
    )(
        xp,
        w1.astype(dt),
        b1.astype(jnp.float32).reshape(1, f),
        w2.astype(dt),
        b2.astype(jnp.float32).reshape(1, d),
        ln_scale.astype(jnp.float32).reshape(1, d),
        ln_bias.astype(jnp.float32).reshape(1, d),
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
    )
    return out[:n], (x, w1, b1, w2, b2, ln_scale, ln_bias, seed)


def _fused_ffn_bwd(eps, rate, interpret, residuals, grad):
    x, w1, b1, w2, b2, ln_scale, ln_bias, seed = residuals
    # Rematerialise through the XLA formulation: same dropout mask by
    # construction (identical splitmix32 of (seed, global flat index)).
    _, vjp = jax.vjp(
        lambda x, w1, b1, w2, b2, g, bt: ffn_reference(
            x, w1, b1, w2, b2, g, bt, seed, eps, rate
        ),
        x, w1, b1, w2, b2, ln_scale, ln_bias,
    )
    dx, dw1, db1, dw2, db2, dg, dbt = vjp(grad)
    d_seed = np.zeros(jnp.shape(seed), dtype=jax.dtypes.float0)
    return dx, dw1, db1, dw2, db2, dg, dbt, d_seed


fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)


# ---------------------------------------------------------------------------
# Saved-intermediate variant: the training-path kernel (VERDICT r3 ask #5).
#
# ``fused_ffn``'s VJP rematerialises the whole forward in XLA, so fwd+bwd
# pays 6 GEMM-equivalents (2 remat + 4 backward) and measured a net LOSS
# vs the einsum path for training (encoder fwd+bwd 48.9 vs 46.5 ms).
# This variant's forward kernel ADDITIONALLY writes the residuals backward
# actually needs — the pre-gelu intermediate h1 [N, F], the normalized
# rows yhat [N, D] (saved explicitly rather than recovered as (y-β)/γ,
# which would blow up rounding error wherever a LayerNorm scale channel
# passes near 0), and the per-row inverse stddev — so backward is the
# minimal 4-GEMM XLA graph with no forward rematerialisation: gelu/LN/
# dropout all reconstruct elementwise from the saved tensors.
# ---------------------------------------------------------------------------


def _gelu_grad_f32(z):
    # d/dz gelu_exact(z) = Phi(z) + z * phi(z), phi the standard normal pdf.
    phi = jnp.exp(-0.5 * z * z) * np.float32(1.0 / np.sqrt(2.0 * np.pi))
    cdf = 0.5 * (1.0 + _erf_f32(z * np.float32(1.0 / np.sqrt(2.0))))
    return cdf + z * phi


def _ffn_saved_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, bt_ref, seed_ref,
    out_ref, h1_ref, yhat_ref, rsig_ref,
    *, eps, rate, rows, d,
):
    x = x_ref[...]  # [R, D] compute dtype
    h1 = (
        jax.lax.dot_general(
            x, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[...]
    )  # [R, F] fp32
    h1_ref[...] = h1.astype(h1_ref.dtype)
    inter = _gelu_exact_f32(h1).astype(x.dtype)
    out = (
        jax.lax.dot_general(
            inter, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[...]
    )  # [R, D] fp32
    if rate > 0.0:
        pid = pl.program_id(0)
        seed = seed_ref[0, 0]
        r = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 0)
        c = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 1)
        flat = (pid.astype(jnp.uint32) * jnp.uint32(rows) + r) * jnp.uint32(
            d
        ) + c
        bits = splitmix32(flat, seed)
        threshold = jnp.uint32(int(rate * float(2**32)))
        out = jnp.where(bits >= threshold, out / (1.0 - rate), 0.0)
    res = x.astype(jnp.float32) + out
    mean = jnp.mean(res, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(res), axis=-1, keepdims=True) - jnp.square(mean)
    rsig = jax.lax.rsqrt(var + eps)
    yhat = (res - mean) * rsig
    yhat_ref[...] = yhat.astype(yhat_ref.dtype)
    rsig_ref[...] = rsig
    out_ref[...] = (yhat * g_ref[...] + bt_ref[...]).astype(out_ref.dtype)


def _row_tile_saved(n: int, d: int, f: int, itemsize: int) -> int | None:
    """Like :func:`_row_tile` plus the saved outputs' per-row VMEM: h1
    [R, F] and yhat [R, D] in the compute dtype, rsig [R, 1] fp32."""
    budget = 13 * 2**20
    weights = 2 * d * f * itemsize
    per_row = (
        f * 4 + f * itemsize * 2 + d * itemsize * 3 + d * 4 * 2 + 4
    )
    cap = max(_round_up(n, 8), 8)
    for r in (512, 256, 128, 64, 32, 16, 8):
        if r <= cap and weights + r * per_row <= budget:
            return r
    return None


def _ffn_saved_reference(x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps,
                         rate):
    """XLA twin of :func:`_ffn_saved_kernel` (fallback when no tile fits,
    and the oracle the tests pin the kernel against)."""
    dt = x.dtype
    h1 = (
        jnp.dot(x, w1.astype(dt), preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32)
    )
    inter = _gelu_exact_f32(h1).astype(dt)
    out = (
        jnp.dot(inter, w2.astype(dt), preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32)
    )
    if rate > 0.0:
        bits = splitmix32(
            jax.lax.iota(jnp.uint32, out.size).reshape(out.shape), seed
        )
        threshold = jnp.uint32(int(rate * float(2**32)))
        out = jnp.where(bits >= threshold, out / (1.0 - rate), 0.0)
    res = x.astype(jnp.float32) + out
    mean = jnp.mean(res, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(res), axis=-1, keepdims=True) - jnp.square(mean)
    rsig = jax.lax.rsqrt(var + eps)
    yhat = (res - mean) * rsig
    y = (yhat * ln_scale + ln_bias).astype(dt)
    return y, h1.astype(dt), yhat.astype(dt), rsig


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_ffn_saved(x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps,
                    rate=0.0, interpret=False):
    """:func:`fused_ffn` with backward-friendly residual saving.

    Same forward semantics (bit-identical math); the kernel additionally
    writes h1/yhat/rsig so the VJP runs the minimal 4-GEMM backward with
    NO forward rematerialisation. Use on the training path; inference
    callers use :func:`fused_ffn` (no extra residual bytes).
    """
    out, _ = _fused_ffn_saved_fwd(
        x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps, rate, interpret
    )
    return out


def _fused_ffn_saved_fwd(x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps,
                         rate, interpret):
    n, d = x.shape
    f = w1.shape[1]
    dt = x.dtype
    r = _row_tile_saved(n, d, f, dt.itemsize)
    if r is None:
        y, h1, yhat, rsig = _ffn_saved_reference(
            x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps, rate
        )
    else:
        np_rows = _round_up(n, r)
        xp = jnp.pad(x, ((0, np_rows - n), (0, 0))) if np_rows != n else x
        row_spec = pl.BlockSpec(
            (r, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        const = lambda shape: pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        kernel = functools.partial(
            _ffn_saved_kernel, eps=eps, rate=rate, rows=r, d=d
        )
        y, h1, yhat, rsig = pl.pallas_call(
            kernel,
            grid=(np_rows // r,),
            in_specs=[
                row_spec,
                const((d, f)),
                const((1, f)),
                const((f, d)),
                const((1, d)),
                const((1, d)),
                const((1, d)),
                pl.BlockSpec(
                    (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
                ),
            ],
            out_specs=[
                row_spec,
                pl.BlockSpec((r, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
                row_spec,
                pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((np_rows, d), dt),
                jax.ShapeDtypeStruct((np_rows, f), dt),
                jax.ShapeDtypeStruct((np_rows, d), dt),
                jax.ShapeDtypeStruct((np_rows, 1), jnp.float32),
            ],
            interpret=interpret,
        )(
            xp,
            w1.astype(dt),
            b1.astype(jnp.float32).reshape(1, f),
            w2.astype(dt),
            b2.astype(jnp.float32).reshape(1, d),
            ln_scale.astype(jnp.float32).reshape(1, d),
            ln_bias.astype(jnp.float32).reshape(1, d),
            jnp.asarray(seed, jnp.int32).reshape(1, 1),
        )
        y, h1, yhat, rsig = y[:n], h1[:n], yhat[:n], rsig[:n]
    residuals = (x, h1, yhat, rsig, w1, w2, ln_scale, seed)
    return y, residuals


def _fused_ffn_saved_bwd(eps, rate, interpret, residuals, dy):
    x, h1, yhat, rsig, w1, w2, ln_scale, seed = residuals
    n, d = x.shape
    dt = x.dtype
    dyf = dy.astype(jnp.float32)
    yhatf = yhat.astype(jnp.float32)
    # LayerNorm backward from the saved normalized rows + inverse stddev.
    dg = jnp.sum(dyf * yhatf, axis=0)
    dbt = jnp.sum(dyf, axis=0)
    dyg = dyf * ln_scale.astype(jnp.float32)
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * yhatf, axis=-1, keepdims=True)
    dr = rsig * (dyg - m1 - yhatf * m2)  # [N, D] fp32
    # Dropout backward: regenerate the identical keep mask.
    if rate > 0.0:
        bits = splitmix32(
            jax.lax.iota(jnp.uint32, dr.size).reshape(dr.shape), seed
        )
        threshold = jnp.uint32(int(rate * float(2**32)))
        do = jnp.where(bits >= threshold, dr / (1.0 - rate), 0.0)
    else:
        do = dr
    db2 = jnp.sum(do, axis=0)
    # gelu value + derivative reconstruct elementwise from the saved h1.
    h1f = h1.astype(jnp.float32)
    a = _gelu_exact_f32(h1f).astype(dt)
    do_dt = do.astype(dt)
    dw2 = jnp.dot(a.T, do_dt, preferred_element_type=jnp.float32)
    da = jnp.dot(do_dt, w2.astype(dt).T, preferred_element_type=jnp.float32)
    dh1 = da * _gelu_grad_f32(h1f)
    db1 = jnp.sum(dh1, axis=0)
    dh1_dt = dh1.astype(dt)
    dw1 = jnp.dot(x.T, dh1_dt, preferred_element_type=jnp.float32)
    dx = (
        jnp.dot(dh1_dt, w1.astype(dt).T, preferred_element_type=jnp.float32)
        + dr
    ).astype(dt)
    d_seed = np.zeros(jnp.shape(seed), dtype=jax.dtypes.float0)
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.astype(w1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(w2.dtype),
        dg.astype(ln_scale.dtype),
        dbt.astype(ln_scale.dtype),
        d_seed,
    )


fused_ffn_saved.defvjp(_fused_ffn_saved_fwd, _fused_ffn_saved_bwd)


def fused_ffn_saved_sharded(
    x, w1, b1, w2, b2, ln_scale, ln_bias, seed, eps, rate=0.0,
    interpret=False, *, mesh, data_axis="data",
):
    """:func:`fused_ffn_saved` per data shard (same contract and TP caveat
    as :func:`fused_ffn_sharded`)."""
    n = x.shape[0]
    dp = mesh.shape[data_axis]
    assert n % dp == 0, (n, dp)
    P = jax.sharding.PartitionSpec

    def local(x, w1, b1, w2, b2, g, bt, seed):
        if rate > 0.0:
            shard = jax.lax.axis_index(data_axis)
            seed = seed + shard.astype(jnp.int32) * jnp.int32(2**16)
        return fused_ffn_saved(
            x, w1, b1, w2, b2, g, bt, seed, eps, rate, interpret
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis, None),) + (P(),) * 7,
        out_specs=P(data_axis, None),
        check_vma=False,
    )(x, w1, b1, w2, b2, ln_scale, ln_bias, seed)


# ---------------------------------------------------------------------------
# Fused attention epilogue: out-projection → dropout → residual → LayerNorm.
# ---------------------------------------------------------------------------


def proj_ln_reference(ctx, res, w, b, ln_scale, ln_bias, seed, eps, rate):
    """XLA formulation of the attention epilogue the kernel fuses (and the
    VJP differentiates): ``LayerNorm(res + dropout(ctx @ w + b))`` — the
    ``attention/out`` Dense + ``attention_ln`` tail of ``EncoderLayer``
    (the HF ``BertSelfOutput`` module the reference drives per window,
    /root/reference/model/BERTgrid_generator.py:99-146)."""
    dt = ctx.dtype
    out = (
        jnp.dot(ctx, w.astype(dt), preferred_element_type=jnp.float32)
        + b.astype(jnp.float32)
    )
    if rate > 0.0:
        n = out.size
        bits = splitmix32(
            jax.lax.iota(jnp.uint32, n).reshape(out.shape), seed
        )
        threshold = jnp.uint32(int(rate * float(2**32)))
        out = jnp.where(bits >= threshold, out / (1.0 - rate), 0.0)
    r = res.astype(jnp.float32) + out
    mean = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(r), axis=-1, keepdims=True) - jnp.square(mean)
    y = (r - mean) * jax.lax.rsqrt(var + eps)
    return (y * ln_scale + ln_bias).astype(dt)


def _proj_ln_kernel(
    ctx_ref, res_ref, w_ref, b_ref, g_ref, bt_ref, seed_ref, out_ref,
    *, eps, rate, rows, d,
):
    ctx = ctx_ref[...]  # [R, D] compute dtype
    out = (
        jax.lax.dot_general(
            ctx,
            w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[...]
    )  # [R, D] fp32
    if rate > 0.0:
        pid = pl.program_id(0)
        seed = seed_ref[0, 0]
        r_ = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 0)
        c_ = jax.lax.broadcasted_iota(jnp.uint32, out.shape, 1)
        flat = (pid.astype(jnp.uint32) * jnp.uint32(rows) + r_) * jnp.uint32(
            d
        ) + c_
        bits = splitmix32(flat, seed)
        threshold = jnp.uint32(int(rate * float(2**32)))
        out = jnp.where(bits >= threshold, out / (1.0 - rate), 0.0)
    r = res_ref[...].astype(jnp.float32) + out
    mean = jnp.mean(r, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(r), axis=-1, keepdims=True) - jnp.square(mean)
    y = (r - mean) * jax.lax.rsqrt(var + eps)
    out_ref[...] = (y * g_ref[...] + bt_ref[...]).astype(out_ref.dtype)


def _proj_row_tile(n: int, d: int, itemsize: int) -> int | None:
    """Row tile for the projection epilogue: W [D, D] constant block plus
    per-row ctx/res/out [R, D] (+ fp32 temporaries). Same 13 MB VMEM budget
    discipline as :func:`_row_tile`."""
    budget = 13 * 2**20
    weights = d * d * itemsize
    per_row = d * itemsize * 3 + d * 4 * 3
    cap = max(_round_up(n, 8), 8)
    for r in (1024, 512, 256, 128, 64, 32, 16, 8):
        if r <= cap and weights + r * per_row <= budget:
            return r
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_proj_ln(ctx, res, w, b, ln_scale, ln_bias, seed, eps, rate=0.0,
                  interpret=False):
    """Fused GEMM→dropout→residual→LayerNorm (attention epilogue).

    ``ctx``: [N, D] attention context rows (compute dtype); ``res``: [N, D]
    residual stream. Weights/biases/LN params are the fp32 flax leaves.
    Returns [N, D] in ``ctx.dtype``. Byte motive: the einsum path writes the
    projection output, re-reads it with the residual, and re-reads the sum
    for LayerNorm — three [N, D] HBM round-trips this kernel collapses into
    ctx+res in, y out.
    """
    out, _ = _fused_proj_ln_fwd(ctx, res, w, b, ln_scale, ln_bias, seed, eps,
                                rate, interpret)
    return out


def _fused_proj_ln_fwd(ctx, res, w, b, ln_scale, ln_bias, seed, eps, rate,
                       interpret):
    n, d = ctx.shape
    dt = ctx.dtype
    r = _proj_row_tile(n, d, dt.itemsize)
    residuals = (ctx, res, w, b, ln_scale, ln_bias, seed)
    if r is None:
        out = proj_ln_reference(ctx, res, w, b, ln_scale, ln_bias, seed, eps,
                                rate)
        return out, residuals
    np_rows = _round_up(n, r)
    if np_rows != n:
        ctx_p = jnp.pad(ctx, ((0, np_rows - n), (0, 0)))
        res_p = jnp.pad(res, ((0, np_rows - n), (0, 0)))
    else:
        ctx_p, res_p = ctx, res

    row_spec = pl.BlockSpec((r, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_proj_ln_kernel, eps=eps, rate=rate, rows=r, d=d)
    out = pl.pallas_call(
        kernel,
        grid=(np_rows // r,),
        in_specs=[
            row_spec,
            row_spec,
            const((d, d)),
            const((1, d)),
            const((1, d)),
            const((1, d)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((np_rows, d), dt),
        interpret=interpret,
    )(
        ctx_p,
        res_p,
        w.astype(dt),
        b.astype(jnp.float32).reshape(1, d),
        ln_scale.astype(jnp.float32).reshape(1, d),
        ln_bias.astype(jnp.float32).reshape(1, d),
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
    )
    return out[:n], residuals


def _fused_proj_ln_bwd(eps, rate, interpret, residuals, grad):
    ctx, res, w, b, ln_scale, ln_bias, seed = residuals
    _, vjp = jax.vjp(
        lambda ctx, res, w, b, g, bt: proj_ln_reference(
            ctx, res, w, b, g, bt, seed, eps, rate
        ),
        ctx, res, w, b, ln_scale, ln_bias,
    )
    dctx, dres, dw, db, dg, dbt = vjp(grad)
    d_seed = np.zeros(jnp.shape(seed), dtype=jax.dtypes.float0)
    return dctx, dres, dw, db, dg, dbt, d_seed


fused_proj_ln.defvjp(_fused_proj_ln_fwd, _fused_proj_ln_bwd)


def fused_proj_ln_sharded(
    ctx, res, w, b, ln_scale, ln_bias, seed, eps, rate=0.0, interpret=False,
    *, mesh, data_axis="data",
):
    """:func:`fused_proj_ln` per data shard (same contract and TP caveat as
    :func:`fused_ffn_sharded`: rows shard on ``data``, weights replicate,
    replicated-input cotangents psum automatically; under TP the out-proj
    weights shard on the input dim and the partial outputs need a psum
    before residual+LN — callers use the einsum path there)."""
    n = ctx.shape[0]
    dp = mesh.shape[data_axis]
    assert n % dp == 0, (n, dp)
    P = jax.sharding.PartitionSpec

    def local(ctx, res, w, b, g, bt, seed):
        if rate > 0.0:
            shard = jax.lax.axis_index(data_axis)
            seed = seed + shard.astype(jnp.int32) * jnp.int32(2**16)
        return fused_proj_ln(ctx, res, w, b, g, bt, seed, eps, rate, interpret)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis, None)) + (P(),) * 5,
        out_specs=P(data_axis, None),
        check_vma=False,
    )(ctx, res, w, b, ln_scale, ln_bias, seed)


def fused_ffn_sharded(
    x,
    w1,
    b1,
    w2,
    b2,
    ln_scale,
    ln_bias,
    seed,
    eps,
    rate=0.0,
    interpret=False,
    *,
    mesh,
    data_axis="data",
):
    """:func:`fused_ffn` per data shard under a multi-device mesh.

    Rows (the folded batch·T axis) shard on ``data``; weights/LN params
    replicate. The transpose of a replicated (``P()``) ``shard_map`` input
    is a psum over the mesh, so weight gradients accumulate correctly
    across shards (pinned by ``tests/test_fused_ffn.py``). Dropout streams
    decorrelate by folding the shard index into the seed — in-kernel
    program ids and the reference's flat iota both restart per shard.

    TP (a >1 ``model`` axis) is deliberately unsupported: the weights would
    shard on the intermediate dim and the partial FFN outputs need a psum
    *before* the residual + LayerNorm, which is the fusion boundary —
    callers use the einsum path there (``models/bert.EncoderLayer``).
    """
    n = x.shape[0]
    dp = mesh.shape[data_axis]
    assert n % dp == 0, (n, dp)
    P = jax.sharding.PartitionSpec

    def local(x, w1, b1, w2, b2, g, bt, seed):
        if rate > 0.0:
            shard = jax.lax.axis_index(data_axis)
            seed = seed + shard.astype(jnp.int32) * jnp.int32(2**16)
        return fused_ffn(x, w1, b1, w2, b2, g, bt, seed, eps, rate, interpret)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis, None),) + (P(),) * 7,
        out_specs=P(data_axis, None),
        check_vma=False,
    )(x, w1, b1, w2, b2, ln_scale, ln_bias, seed)
