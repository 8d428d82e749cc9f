"""Counter-based (stateless-hash) dropout.

``flax.linen.Dropout`` draws its keep mask with ``jax.random.bernoulli`` —
a threefry2x32 evaluation per element. Over the BERT encoder's 25 dropout
sites (2 hidden + embedding, 12 layers, [B, 512, 768] each at bench shapes)
that is ~75M threefry draws per forward, ~3 ms/step on a v5e chip — pure
mask-generation overhead the reference never pays because cuDNN dropout uses
a cheap Philox counter.

This module is the XLA twin of the in-kernel attention dropout in
:mod:`vibertgrid_tpu.ops.flash_attention`: the keep decision is a splitmix32
hash of (seed, flat element index) — a handful of VPU ops that fuse into the
surrounding elementwise code. A custom VJP recomputes the mask from the seed
in the backward pass, so no [B, T, D] mask is ever stored between fwd and
bwd (nn.Dropout's mask is a residual: ~75 MB of extra HBM traffic per step).

Statistical quality: splitmix32 finalizers pass standard avalanche tests;
dropout only needs per-element Bernoulli(1-rate) independence, far below the
bar of a stream cipher. Different call sites get independent masks because
each derives its scalar seed from a distinct folded PRNG key.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def splitmix32(x: jax.Array, seed: jax.Array) -> jax.Array:
    """Splitmix32-style finalizer of (seed, counter): uint32 → uint32.

    Every step (seed xor, xor-shift mixes, odd-constant multiplies) is a
    bijection on uint32, so distinct inputs give distinct outputs for a
    fixed seed — the sampled losses rely on that for tie-free threshold
    selection. Shared by :func:`hash_dropout`, the in-kernel attention-prob
    dropout (ops/flash_attention.py), and the sampled-loss key streams
    (ops/losses._hash_bits); distinct seeds keep the streams independent.
    """
    x = x ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _mask(shape, seed, rate, dtype):
    """Keep-mask ⊙ 1/(1-rate) from :func:`splitmix32` of (seed, index)."""
    n = int(np.prod(shape))
    x = splitmix32(jax.lax.iota(jnp.uint32, n), seed)
    threshold = jnp.uint32(int(rate * float(2**32)))
    scale = jnp.asarray(1.0 / (1.0 - rate), dtype)
    return jnp.where(x >= threshold, scale, jnp.zeros((), dtype)).reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_dropout(x: jax.Array, seed: jax.Array, rate: float) -> jax.Array:
    """Dropout with a counter-based mask.

    Args:
        x: input array.
        seed: scalar int32; each call site must use a distinct seed.
        rate: static drop probability in [0, 1).
    """
    if rate <= 0.0:
        return x
    return x * _mask(x.shape, seed, rate, x.dtype)


def _fwd(x, seed, rate):
    return hash_dropout(x, seed, rate), seed


def _bwd(rate, seed, g):
    gx = g if rate <= 0.0 else g * _mask(g.shape, seed, rate, g.dtype)
    d_seed = np.zeros((), dtype=jax.dtypes.float0)
    return gx, d_seed


hash_dropout.defvjp(_fwd, _bwd)


def derive_seed(key: jax.Array) -> jax.Array:
    """Scalar int32 seed from a PRNG key (one threefry draw, not per-element)."""
    return jax.random.randint(key, (), 0, np.iinfo(np.int32).max, dtype=jnp.int32)
