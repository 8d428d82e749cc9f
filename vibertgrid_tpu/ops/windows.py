"""Sliding-window framing for long corpora.

The reference chops corpora longer than BERT's 510-payload limit into
``win_count = seq_len // 510 + 1`` windows framed with [CLS]/[SEP] and runs
the encoder once per window in a Python loop
(``/root/reference/model/BERTgrid_generator.py:81-146``). Windows are
independent (no cross-window attention), so the TPU formulation folds them
into the batch axis and runs **one** encoder call over ``[B·W, payload+2]``
— the long-context strategy noted in SURVEY.md §5.7.

Host-side collation pads token streams to a multiple of ``payload`` so the
reshape here is static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

PAYLOAD = 510  # tokens per window, excluding [CLS]/[SEP]


@functools.partial(jax.jit, static_argnames=("cls_id", "sep_id", "payload"))
def frame_windows(
    tokens: jax.Array,
    token_mask: jax.Array,
    *,
    cls_id: int = 101,
    sep_id: int = 102,
    payload: int = PAYLOAD,
) -> tuple[jax.Array, jax.Array]:
    """Fold ``[B, W*payload]`` token streams into ``[B*W, payload+2]`` windows.

    Each window is framed ``[CLS] chunk [SEP]`` with attention mask 1 on the
    frame tokens (the reference gives [CLS]/[SEP] mask 1 even in all-padding
    windows, reproduced here). Default ids are the BERT WordPiece ones the
    reference hardcodes; the model passes the tokenizer's real ids.
    """
    b, t = tokens.shape
    assert t % payload == 0, f"token length {t} not a multiple of {payload}"
    w = t // payload
    chunks = tokens.reshape(b * w, payload).astype(jnp.int32)
    mchunks = token_mask.reshape(b * w, payload).astype(jnp.int32)
    ones = jnp.ones((b * w, 1), jnp.int32)
    ids = jnp.concatenate([ones * cls_id, chunks, ones * sep_id], axis=1)
    mask = jnp.concatenate([ones, mchunks, ones], axis=1)
    return ids, mask


@functools.partial(jax.jit, static_argnames=("batch_size", "payload"))
def unframe_windows(
    window_embeddings: jax.Array, *, batch_size: int, payload: int = PAYLOAD
) -> jax.Array:
    """Drop the frame positions and restore ``[B, W*payload, D]``.

    Mirrors the reference's ``curr_output[:, 1:(1+curr_seq_len)]`` slice +
    concat (``model/BERTgrid_generator.py:137-146``).
    """
    bw, lw, d = window_embeddings.shape
    assert lw == payload + 2
    w = bw // batch_size
    return window_embeddings[:, 1 : 1 + payload, :].reshape(
        batch_size, w * payload, d
    )
