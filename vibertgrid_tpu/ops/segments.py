"""Token → segment embedding aggregation.

The reference walks every token of the batch in a sequential Python loop and
either averages ("mean") or keeps the first ("first") token embedding of each
wordpiece run sharing a ``seg_index``
(``/root/reference/model/BERTgrid_generator.py:148-191``). That loop is a
host-side bottleneck; here both modes are single fused segment reductions that
stay on-device and vectorize over the whole batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_segments", "mode"))
def aggregate_token_embeddings(
    token_embeddings: jax.Array,
    seg_ids: jax.Array,
    token_mask: jax.Array,
    *,
    num_segments: int,
    mode: str = "mean",
) -> jax.Array:
    """Aggregate wordpiece embeddings into segment embeddings.

    Args:
        token_embeddings: ``[T, D]`` (or batched ``[B, T, D]``) embeddings.
        seg_ids: ``[T]`` (``[B, T]``) int segment index per token, in
            ``[0, num_segments)`` for valid tokens; values of masked tokens
            are ignored.
        token_mask: ``[T]`` (``[B, T]``) bool validity.
        num_segments: static segment capacity ``S``.
        mode: ``"mean"`` averages each segment's tokens, ``"first"`` takes the
            embedding of its first valid token (lowest position), matching the
            reference's two grid modes.

    Returns:
        ``[S, D]`` (``[B, S, D]``) segment embeddings; zero rows for segments
        with no valid tokens.
    """
    if token_embeddings.ndim == 3:
        return jax.vmap(
            lambda e, s, m: aggregate_token_embeddings(
                e, s, m, num_segments=num_segments, mode=mode
            )
        )(token_embeddings, seg_ids, token_mask)

    t = seg_ids.shape[0]
    valid = token_mask.astype(bool)
    # Route invalid tokens to an overflow bucket S that is sliced away.
    ids = jnp.where(valid, seg_ids.astype(jnp.int32), num_segments)

    if mode == "mean":
        sums = jax.ops.segment_sum(
            jnp.where(valid[:, None], token_embeddings, 0),
            ids,
            num_segments=num_segments + 1,
        )[:-1]
        counts = jax.ops.segment_sum(
            valid.astype(token_embeddings.dtype), ids, num_segments=num_segments + 1
        )[:-1]
        return sums / jnp.maximum(counts, 1)[:, None]
    elif mode == "first":
        pos = jnp.arange(t, dtype=jnp.int32)
        first_pos = jax.ops.segment_min(
            jnp.where(valid, pos, t), ids, num_segments=num_segments + 1
        )[:-1]
        has_any = first_pos < t
        gathered = jnp.take(
            token_embeddings, jnp.minimum(first_pos, t - 1), axis=0
        )
        return jnp.where(has_any[:, None], gathered, 0)
    else:
        raise ValueError(f"mode must be 'mean' or 'first', got {mode!r}")
