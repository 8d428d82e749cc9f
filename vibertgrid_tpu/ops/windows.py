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
    seq_len: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fold ``[B, W*payload]`` token streams into ``[B*W, payload+2]`` windows.

    Each window is framed ``[CLS] chunk [SEP]``. The reference places [SEP]
    immediately after the window's SLICE of the padded batch corpus
    (``[CLS] + corpus[:, s:e] + [SEP] + pads``, BERTgrid_generator.py:106-129),
    so in the final (partially filled) window [SEP] sits at ``1 + width``,
    not at the end — and since [SEP] carries attention mask 1, its position
    embedding shifts every token's output. ``seq_len`` (the batch-max valid
    token count, the width ``pad_sequence`` would give the reference's
    corpus) reproduces that placement exactly; ``None`` keeps the
    SEP-at-end framing (used only where parity is not at stake).

    [CLS] has mask 1 even in all-padding overflow windows (the reference
    never creates those — they contribute no aggregated tokens either way).
    Default ids are the BERT WordPiece ones the reference hardcodes; the
    model passes the tokenizer's real ids.
    """
    b, t = tokens.shape
    assert t % payload == 0, f"token length {t} not a multiple of {payload}"
    w = t // payload
    chunks = tokens.reshape(b * w, payload).astype(jnp.int32)
    mchunks = token_mask.reshape(b * w, payload).astype(jnp.int32)
    ones = jnp.ones((b * w, 1), jnp.int32)
    if seq_len is None:
        ids = jnp.concatenate([ones * cls_id, chunks, ones * sep_id], axis=1)
        mask = jnp.concatenate([ones, mchunks, ones], axis=1)
        return ids, mask
    # Window w's slice width = clip(seq_len - w*payload, 0, payload);
    # [SEP] goes at 1 + width (a traced position — one-hot where, no gather).
    widths = jnp.clip(
        seq_len.astype(jnp.int32)
        - jnp.tile(jnp.arange(w, dtype=jnp.int32), b) * payload,
        0,
        payload,
    )  # [B*W]
    sep_pos = (1 + widths)[:, None]  # [B*W, 1]
    zeros = jnp.zeros((b * w, 1), jnp.int32)
    ids = jnp.concatenate([ones * cls_id, chunks, zeros], axis=1)
    mask = jnp.concatenate([ones, mchunks, zeros], axis=1)
    pos = jnp.arange(payload + 2, dtype=jnp.int32)[None, :]
    at_sep = pos == sep_pos
    ids = jnp.where(at_sep, sep_id, ids)
    mask = jnp.where(at_sep, 1, mask)
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
