"""Sampled / OHEM losses as static-shape masked reductions.

Re-derivation of the four loss classes in
``/root/reference/pipeline/custom_loss.py`` for jit: the reference filters
tensors with boolean indexing and ``min(k, available)`` (data-dependent
shapes); here every variant is a masked fixed-shape computation —
"masking-not-filtering", SURVEY.md §7 hard-part 1/3.

Semantics per variant (reference lines cited):

- ``cross_entropy_random_sample`` (custom_loss.py:9-101): per-category random
  keep of ``min(sample, n_cat)`` elements; 2-element sample lists split into
  (target==0, target!=0) categories, C-element lists split per class.
- ``cross_entropy_ohem`` (custom_loss.py:104-201): positives = target != 0,
  negatives = target == 0; optional random pre-sampling of ``2k`` before
  keeping the top-``min(k, n)`` *hardest* (largest) losses of each side;
  mean = sum / total kept.
- ``bce_random_sample`` (custom_loss.py:204-290): same as the CE variant but
  binary, with categories split by the *prediction sign* (input > 0).
- ``bce_ohem`` (custom_loss.py:293-382): binary OHEM split by target == 0.

Known deliberate divergence: the reference re-indexes the *sorted* loss array
with the original element indices of the top-k (custom_loss.py:175-176,
:356-357), which selects a quasi-random subset instead of the hardest k. We
implement true top-k OHEM (the intended algorithm). ``k = -1`` disables
mining, matching the reference's plain-loss path.

All functions take a ``valid`` mask so padded batch entries behave exactly as
if absent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ce_per_example(logits, targets, weight=None):
    """Per-example weighted cross entropy (torch ``reduction='none'``).

    The gold-logit pick and the class-weight lookup are one-hot selects, not
    gathers: the seg-head calls this over full-resolution maps (1.5M pixels
    at bench shapes) and a [1.5M]-element gather costs ~22 ms on v5e while
    the onehot·reduce fuses into the surrounding elementwise code for free.
    """
    logits = logits.astype(jnp.float32)
    onehot = _onehot(targets, logits.shape[-1])
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1)
    loss = logz - gold
    if weight is not None:
        loss = loss * _per_example_weight(targets, weight)
    return loss


def _per_example_weight(targets, weight):
    """Class weight per example, as a one-hot select (no gather)."""
    w = jnp.asarray(weight, jnp.float32)
    return jnp.sum(
        jnp.where(_onehot(targets, w.shape[0]), w[None, :], 0.0), axis=-1
    )


def _bce_per_example(logits, targets):
    """Per-example binary cross entropy with logits (stable formulation)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def _sortable_key(x):
    """Monotone fp32 → uint32 key (total order; sign-flip trick)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where(x >= 0, b | jnp.uint32(0x80000000), ~b)


def _onehot(targets, num_classes):
    """[N, C] bool one-hot of integer targets (gather-free select matrix)."""
    return targets[:, None].astype(jnp.int32) == jnp.arange(num_classes)[None, :]


def _masked_topk_sum(losses, mask, k):
    """Sum of the ``min(k, n_masked)`` largest masked losses.

    Returns ``(sum, kept_count)``. ``k = -1`` keeps everything masked.

    No sort: ``lax.top_k`` lowers to a full variadic sort on TPU (~2.15 ms
    over the 1.5M-pixel aux maps). Instead, binary-search the 32 bits of the
    k-th largest value's sortable key (32 masked count-reductions, each a
    cheap memory-bound pass), then sum the elements strictly above the
    threshold and add the exact number of threshold-valued ties. Sums are
    tie-order invariant, so this equals the top-k sum bit-for-bit in
    exact arithmetic (and matches torch's pick-then-sum up to reduction
    order, like any parallel reduction).
    """
    n = jnp.sum(mask.astype(jnp.int32))
    if k == -1:
        return jnp.sum(jnp.where(mask, losses, 0.0)), n

    keys = jnp.where(mask, _sortable_key(losses), jnp.uint32(0)).reshape(-1)

    def bit_step(i, t):
        cand = t | (jnp.uint32(1) << (31 - i))
        cnt = jnp.sum((keys >= cand).astype(jnp.int32))
        return jnp.where(cnt >= k, cand, t)

    # largest t with count(keys >= t) >= k == key of the k-th largest value
    # (t == 0, i.e. "keep everything", when fewer than k are masked).
    t = jax.lax.fori_loop(0, 32, bit_step, jnp.uint32(0))

    above = keys > t
    cnt_above = jnp.sum(above.astype(jnp.int32))
    total_above = jnp.sum(jnp.where(above.reshape(mask.shape), losses, 0.0))
    kept = jnp.minimum(k, n)
    # Threshold ties: n_take of them belong to the top-k. Express their
    # contribution through the loss VALUES (n_take/n_ties · Σ tied losses —
    # identical since ties are equal-valued) so gradients flow to every tied
    # element. A bit-decoded `n_take · value(t)` would be correct in value
    # but carry ZERO gradient, and ties are pervasive here: the aux losses
    # run over 4×-nearest-upsampled logit maps where every value repeats
    # across 4×4 pixel blocks.
    ties = (keys == t).reshape(mask.shape) & mask & (t > 0)
    cnt_ties = jnp.sum(ties.astype(jnp.int32))
    sum_ties = jnp.sum(jnp.where(ties, losses, 0.0))
    n_take = jnp.maximum(kept - cnt_above, 0)
    frac = n_take.astype(jnp.float32) / jnp.maximum(cnt_ties, 1).astype(
        jnp.float32
    )
    return total_above + frac * sum_ties, kept


def _random_subsample_mask(mask, limit, key):
    """Keep a uniformly random ``min(limit, n)`` subset of a boolean mask.

    Exact without-replacement sampling: the k largest of iid random keys
    over the masked entries are a uniform random k-subset (Gumbel-top-k for
    uniform weights). Selection is sortless — binary-search the k-th largest
    random key (32 masked count passes), then break threshold ties by a
    cumsum — because both ``lax.top_k`` and the index scatter it needs cost
    full sorts/scatters over the 1.5M-pixel aux maps.
    """
    limit_eff = min(limit, mask.size)
    flat = mask.reshape(-1)
    bits = jax.random.bits(key, (mask.size,), dtype=jnp.uint32)

    def bit_step(i, t):
        cand = t | (jnp.uint32(1) << (31 - i))
        cnt = jnp.sum((flat & (bits >= cand)).astype(jnp.int32))
        return jnp.where(cnt >= limit_eff, cand, t)

    t = jax.lax.fori_loop(0, 32, bit_step, jnp.uint32(0))
    above = flat & (bits > t)
    ties = flat & (bits == t)
    n = jnp.sum(flat.astype(jnp.int32))
    n_take = jnp.maximum(
        jnp.minimum(limit_eff, n) - jnp.sum(above.astype(jnp.int32)), 0
    )
    # ties hold identical random keys, so any n_take of them is a uniform
    # choice; take the first by position via a cumsum.
    tie_rank = jnp.cumsum(ties.astype(jnp.int32))
    keep = above | (ties & (tie_rank <= n_take))
    return mask & keep.reshape(mask.shape)


def cross_entropy_ohem(
    logits: jax.Array,
    targets: jax.Array,
    valid: jax.Array,
    *,
    num_hard_positive: int = -1,
    num_hard_negative: int = -1,
    weight=None,
    random: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """CE with online hard example mining (custom_loss.py:104-201)."""
    losses = _ce_per_example(logits, targets, weight)
    valid = valid.astype(bool)
    if num_hard_positive == -1 and num_hard_negative == -1:
        if weight is not None:
            # torch mean of weighted CE divides by the summed weights.
            wsum = jnp.sum(
                jnp.where(valid, _per_example_weight(targets, weight), 0.0)
            )
            return jnp.sum(jnp.where(valid, losses, 0.0)) / jnp.maximum(wsum, 1e-12)
        n = jnp.sum(valid.astype(jnp.float32))
        return jnp.sum(jnp.where(valid, losses, 0.0)) / jnp.maximum(n, 1.0)

    pos_mask = valid & (targets != 0)
    neg_mask = valid & (targets == 0)
    if random:
        assert key is not None, "ohem random sampling needs a PRNG key"
        kp, kn = jax.random.split(key)
        if num_hard_positive != -1:
            pos_mask = _random_subsample_mask(pos_mask, 2 * num_hard_positive, kp)
        if num_hard_negative != -1:
            neg_mask = _random_subsample_mask(neg_mask, 2 * num_hard_negative, kn)
    pos_sum, pos_n = _masked_topk_sum(losses, pos_mask, num_hard_positive)
    neg_sum, neg_n = _masked_topk_sum(losses, neg_mask, num_hard_negative)
    total_n = (pos_n + neg_n).astype(jnp.float32)
    return (pos_sum + neg_sum) / jnp.maximum(total_n, 1.0)


def cross_entropy_random_sample(
    logits: jax.Array,
    targets: jax.Array,
    valid: jax.Array,
    *,
    sample_list=None,
    weight=None,
    key: jax.Array | None = None,
) -> jax.Array:
    """CE with per-category random sampling (custom_loss.py:9-101)."""
    losses = _ce_per_example(logits, targets, weight)
    valid = valid.astype(bool)
    if sample_list is None:
        n = jnp.sum(valid.astype(jnp.float32))
        return jnp.sum(jnp.where(valid, losses, 0.0)) / jnp.maximum(n, 1.0)

    assert key is not None, "random sampling needs a PRNG key"
    num_cats = len(sample_list)
    if num_cats == 2 and logits.shape[-1] >= 2:
        cat_masks = [valid & (targets == 0), valid & (targets != 0)]
    else:
        assert num_cats == logits.shape[-1], (
            f"sample_list length {num_cats} must be 2 or match the class "
            f"dimension {logits.shape[-1]}"
        )
        cat_masks = [valid & (targets == i) for i in range(num_cats)]

    keys = jax.random.split(key, num_cats)
    total = jnp.zeros((), jnp.float32)
    count = jnp.zeros((), jnp.float32)
    for cat_mask, sample, k in zip(cat_masks, sample_list, keys):
        kept = _random_subsample_mask(cat_mask, sample, k)
        total = total + jnp.sum(jnp.where(kept, losses, 0.0))
        count = count + jnp.sum(kept.astype(jnp.float32))
    return total / jnp.maximum(count, 1.0)


def bce_ohem(
    logits: jax.Array,
    targets: jax.Array,
    valid: jax.Array,
    *,
    num_hard_positive: int = -1,
    num_hard_negative: int = -1,
    random: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """Binary CE with OHEM, split by target (custom_loss.py:293-382)."""
    losses = _bce_per_example(logits, targets)
    valid = valid.astype(bool)
    if num_hard_positive == -1 and num_hard_negative == -1:
        n = jnp.sum(valid.astype(jnp.float32))
        return jnp.sum(jnp.where(valid, losses, 0.0)) / jnp.maximum(n, 1.0)

    pos_mask = valid & (targets != 0)
    neg_mask = valid & (targets == 0)
    if random:
        assert key is not None
        kp, kn = jax.random.split(key)
        if num_hard_positive != -1:
            pos_mask = _random_subsample_mask(pos_mask, 2 * num_hard_positive, kp)
        if num_hard_negative != -1:
            neg_mask = _random_subsample_mask(neg_mask, 2 * num_hard_negative, kn)
    pos_sum, pos_n = _masked_topk_sum(losses, pos_mask, num_hard_positive)
    neg_sum, neg_n = _masked_topk_sum(losses, neg_mask, num_hard_negative)
    total_n = (pos_n + neg_n).astype(jnp.float32)
    return (pos_sum + neg_sum) / jnp.maximum(total_n, 1.0)


def bce_random_sample(
    logits: jax.Array,
    targets: jax.Array,
    valid: jax.Array,
    *,
    sample_list=None,
    key: jax.Array | None = None,
) -> jax.Array:
    """Binary CE with random sampling split by prediction sign
    (custom_loss.py:204-290: category 0 = input <= 0, 1 = input > 0)."""
    losses = _bce_per_example(logits, targets)
    valid = valid.astype(bool)
    if sample_list is None:
        n = jnp.sum(valid.astype(jnp.float32))
        return jnp.sum(jnp.where(valid, losses, 0.0)) / jnp.maximum(n, 1.0)

    assert key is not None
    samples = list(sample_list)
    if len(samples) == 1:
        samples = [samples[0], samples[0]]
    # Reference quirk (custom_loss.py:222-223): with a 2-element list, index 1
    # is overwritten by index 0 — both categories use sample_list[0].
    samples = [samples[0], samples[0]]
    cat_masks = [valid & (logits <= 0), valid & (logits > 0)]
    keys = jax.random.split(key, 2)
    total = jnp.zeros((), jnp.float32)
    count = jnp.zeros((), jnp.float32)
    for cat_mask, sample, k in zip(cat_masks, samples, keys):
        kept = _random_subsample_mask(cat_mask, sample, k)
        total = total + jnp.sum(jnp.where(kept, losses, 0.0))
        count = count + jnp.sum(kept.astype(jnp.float32))
    return total / jnp.maximum(count, 1.0)
