"""Linear-chain CRF as vectorized scans.

The reference CRF (``/root/reference/model/crf.py``) runs per-tag Python
loops for the forward algorithm (:47-77), gold-path scoring (:79-94) and
Viterbi decoding with Python-list backpointers (:96-146) — one kernel launch
per tag per step. Here each is a single ``lax.scan`` over time with the full
tag dimension vectorized, batched with ``vmap`` and masked by per-sample
lengths (SURVEY.md §7 hard-part 5).

Tag layout matches the reference: ``K = num_tags`` includes START = K-2 and
STOP = K-1 appended after the ``tag_to_idx`` classes
(``model/field_type_classification_head.py:629-637``). ``transitions[i, j]``
is the score of transitioning *to* i *from* j; rows to START and columns from
STOP are pinned to -1e4 (``model/crf.py:40-45``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -10000.0


def init_transitions(key: jax.Array, num_tags: int) -> jax.Array:
    """Random-normal transitions with START/STOP constraints."""
    t = jax.random.normal(key, (num_tags, num_tags), jnp.float32)
    t = t.at[num_tags - 2, :].set(NEG)  # never transition to START
    t = t.at[:, num_tags - 1].set(NEG)  # never transition from STOP
    return t


def _forward_logz(transitions, feats, length):
    """log partition function over the first ``length`` steps of feats [T,K]."""
    k = transitions.shape[0]
    start, stop = k - 2, k - 1
    init = jnp.full((k,), NEG, jnp.float32).at[start].set(0.0)

    def step(carry, inp):
        feat, t = inp
        # next[i] = logsumexp_j carry[j] + trans[i, j] + feat[i]
        scores = carry[None, :] + transitions + feat[:, None]
        nxt = jax.nn.logsumexp(scores, axis=1)
        carry = jnp.where(t < length, nxt, carry)
        return carry, None

    ts = jnp.arange(feats.shape[0])
    final, _ = jax.lax.scan(step, init, (feats.astype(jnp.float32), ts))
    return jax.nn.logsumexp(final + transitions[stop])


def _gold_score(transitions, feats, tags, length):
    """Score of the gold path (model/crf.py:79-94), masked by length."""
    k = transitions.shape[0]
    start, stop = k - 2, k - 1
    t_len = feats.shape[0]
    prev = jnp.concatenate([jnp.array([start], jnp.int32), tags[:-1].astype(jnp.int32)])
    steps = (
        transitions[tags.astype(jnp.int32), prev]
        + jnp.take_along_axis(
            feats.astype(jnp.float32), tags[:, None].astype(jnp.int32), axis=1
        )[:, 0]
    )
    mask = jnp.arange(t_len) < length
    score = jnp.sum(jnp.where(mask, steps, 0.0))
    last = tags[jnp.maximum(length - 1, 0)].astype(jnp.int32)
    return score + transitions[stop, last]


def crf_nll(
    transitions: jax.Array,
    feats: jax.Array,
    tags: jax.Array,
    length: jax.Array,
) -> jax.Array:
    """Per-sample CRF negative log likelihood ``(logZ - gold) / length``
    (model/crf.py:148-152). feats [T, K], tags [T] int, length scalar int."""
    logz = _forward_logz(transitions, feats, length)
    gold = _gold_score(transitions, feats, tags, length)
    return (logz - gold) / jnp.maximum(length.astype(jnp.float32), 1.0)


def crf_decode(
    transitions: jax.Array, feats: jax.Array, length: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Viterbi decode (model/crf.py:96-146) → (path_score, tags [T]).

    Positions >= length hold the final real tag (harmless padding values);
    masked consumers must slice by length.
    """
    k = transitions.shape[0]
    t_len = feats.shape[0]
    start, stop = k - 2, k - 1
    init = jnp.full((k,), NEG, jnp.float32).at[start].set(0.0)
    tags_id = jnp.arange(k, dtype=jnp.int32)

    def fwd(carry, inp):
        feat, t = inp
        scores = carry[None, :] + transitions  # [next, prev]
        best_prev = jnp.argmax(scores, axis=1).astype(jnp.int32)
        best_score = jnp.max(scores, axis=1) + feat
        active = t < length
        carry = jnp.where(active, best_score, carry)
        bp = jnp.where(active, best_prev, tags_id)  # identity beyond length
        return carry, bp

    ts = jnp.arange(t_len)
    final, bps = jax.lax.scan(fwd, init, (feats.astype(jnp.float32), ts))
    terminal = final + transitions[stop]
    best_last = jnp.argmax(terminal).astype(jnp.int32)
    path_score = terminal[best_last]

    def back(carry, bp):
        prev = bp[carry]
        return prev, carry

    _, path_rev = jax.lax.scan(back, best_last, bps, reverse=True)
    return path_score, path_rev


@functools.partial(jax.jit, static_argnames=())
def crf_nll_batch(transitions, feats, tags, lengths):
    """Mean NLL over a batch — matches the reference's per-sample loop + mean
    (model/field_type_classification_head.py:687-697)."""
    per = jax.vmap(lambda f, t, l: crf_nll(transitions, f, t, l))(
        feats, tags, lengths
    )
    return jnp.mean(per)


@functools.partial(jax.jit, static_argnames=())
def crf_decode_batch(transitions, feats, lengths):
    return jax.vmap(lambda f, l: crf_decode(transitions, f, l))(feats, lengths)
