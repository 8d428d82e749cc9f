"""Masked BatchNorm.

The reference's ROI embedding applies ``nn.BatchNorm2d`` to a tensor of
*unpadded* RoIs (``model/field_type_classification_head.py:51-60``). Our
static-shape batches carry padding RoIs, which must not contaminate the batch
statistics — this module computes masked statistics and, like all BatchNorm
under GSPMD jit over a sharded batch, reduces them globally (the SyncBN
equivalent).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


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
            if not is_init and self.is_mutable_collection("batch_stats"):
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) / jnp.sqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)
