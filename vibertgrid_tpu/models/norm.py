"""Normalization layers: compute-dtype I/O, fp32 statistics.

``flax.linen.BatchNorm``/``LayerNorm`` with ``dtype=float32`` materialise an
fp32 activation between every pair of bf16 convs/matmuls — at bench shapes
that doubles the normalization share of HBM traffic in a program that runs
at the bandwidth roofline (tools/bytes_breakdown.py). These replacements
keep the *stored* arrays in the compute dtype and do the statistics math on
an fp32 upcast that XLA fuses (never materialised): identical math to the
flax modules in fp32 mode, standard bf16-residual-stream numerics in bf16
mode. Parameter / ``batch_stats`` trees match the flax modules exactly, so
checkpoints are interchangeable.

``MaskedBatchNorm``: the reference's ROI embedding applies
``nn.BatchNorm2d`` to a tensor of *unpadded* RoIs
(``model/field_type_classification_head.py:51-60``). Our static-shape
batches carry padding RoIs, which must not contaminate the batch statistics
— it computes masked statistics. Like every BatchNorm here, statistics
under GSPMD jit over a sharded batch reduce globally (the SyncBN
equivalent).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


class BatchNorm(nn.Module):
    """``nn.BatchNorm``-compatible (same param/batch_stats tree), but the
    input/output arrays stay in ``dtype`` while statistics and running
    averages are fp32."""

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            # flax convention: biased variance via E[x²] − E[x]².
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            initializing = self.is_mutable_collection("params")
            if not initializing:
                if not self.is_mutable_collection("batch_stats"):
                    # flax nn.BatchNorm raises here too (variable write into
                    # an immutable collection); never silently train with
                    # frozen running statistics.
                    raise ValueError(
                        "BatchNorm in training mode requires "
                        "mutable=['batch_stats']"
                    )
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class LayerNorm(nn.Module):
    """``nn.LayerNorm``-compatible (params ``scale``/``bias``), fp32 math on
    the last axis, arrays stored in ``dtype``."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over leading dims with an entry validity mask.

    ``x``: ``[N, ..., C]``; ``mask``: ``[N]`` bool. Statistics are computed
    over all non-channel dims of the valid entries.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if train:
            m = mask.astype(jnp.float32).reshape(
                (x.shape[0],) + (1,) * (x.ndim - 1)
            )
            denom = jnp.maximum(
                jnp.sum(m) * (x[0].size // c), 1.0
            )  # valid elements per channel
            xm = x.astype(jnp.float32) * m
            mean = jnp.sum(xm, axis=tuple(range(x.ndim - 1))) / denom
            diff = (x.astype(jnp.float32) - mean) * m
            var = jnp.sum(diff * diff, axis=tuple(range(x.ndim - 1))) / denom
            is_init = self.is_mutable_collection("params")
            if not is_init:
                if not self.is_mutable_collection("batch_stats"):
                    raise ValueError(
                        "MaskedBatchNorm in training mode requires "
                        "mutable=['batch_stats']"
                    )
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) / jnp.sqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)
