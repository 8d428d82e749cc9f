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


def _hash_bits(n: int, key) -> jax.Array:
    """``[n]`` uint32 random keys: splitmix finalizer of (seed, index).

    Replaces ``jax.random.bits`` (threefry is ~12 ops/word; these streams run
    at full label resolution — 1.5M pixels × several categories per step at
    bench shapes; one scalar threefry draw seeds the stream). The finalizer
    is a bijection on uint32 (see :func:`vibertgrid_tpu.ops.dropout.
    splitmix32`), so for a fixed seed the n keys are pairwise DISTINCT — the
    threshold selections below can rely on at most one element ever tying
    the k-th key."""
    from vibertgrid_tpu.ops.dropout import derive_seed, splitmix32

    return splitmix32(jax.lax.iota(jnp.uint32, n), derive_seed(key))


def _random_subsample_masks(cat_masks, limits, key):
    """Uniform ``min(limit_i, n_i)`` subsets of K **disjoint** categories.

    Exact without-replacement sampling: the k largest of random keys over a
    category's entries are a uniform k-subset (Gumbel-top-k for uniform
    weights). Selection is sortless — one joint 32-pass binary search carries
    all K thresholds, so the key stream is read once per pass regardless of
    K, and ``lax.top_k``'s full sort over the 1.5M-pixel aux maps never
    happens. All categories draw from ONE shared bijective key stream:
    disjointness makes the picks independent across categories, and key
    distinctness (see :func:`_hash_bits`) means at most one element ties
    each threshold — no cumsum rank-break needed.

    Returns a list of kept masks, same shapes as ``cat_masks``.
    """
    n = cat_masks[0].size
    k_cats = len(cat_masks)
    bits = _hash_bits(n, key)
    limits_eff = jnp.asarray([min(l, n) for l in limits], jnp.int32)

    if k_cats == 1:
        # scalar-threshold fast path (the [K, N] stacked reduction lowers
        # noticeably worse than a plain full reduction when K == 1)
        flat0 = cat_masks[0].reshape(-1)
        lim0 = min(limits[0], n)

        def bit_step1(i, t):
            cand = t | (jnp.uint32(1) << (31 - i))
            cnt = jnp.sum((flat0 & (bits >= cand)).astype(jnp.int32))
            return jnp.where(cnt >= lim0, cand, t)

        ts = jax.lax.fori_loop(0, 32, bit_step1, jnp.uint32(0))[None]
        flats = flat0[None]
    else:
        flats = jnp.stack([m.reshape(-1) for m in cat_masks])  # [K, N]

        def bit_step(i, ts):
            cand = ts | (jnp.uint32(1) << (31 - i))
            cnt = jnp.sum(flats & (bits[None, :] >= cand[:, None]), axis=1)
            return jnp.where(cnt >= limits_eff, cand, ts)

        ts = jax.lax.fori_loop(0, 32, bit_step, jnp.zeros((k_cats,), jnp.uint32))

    outs = []
    for i in range(k_cats):
        flat = flats[i]
        above = flat & (bits > ts[i])
        ties = flat & (bits == ts[i])  # ≤ 1 element (distinct keys)
        n_cat = jnp.sum(flat.astype(jnp.int32))
        n_take = jnp.maximum(
            jnp.minimum(limits_eff[i], n_cat)
            - jnp.sum(above.astype(jnp.int32)),
            0,
        )
        keep = above | (ties & (n_take >= 1))
        outs.append(cat_masks[i] & keep.reshape(cat_masks[i].shape))
    return outs


def _random_subsample_mask(mask, limit, key):
    """Single-category :func:`_random_subsample_masks`."""
    return _random_subsample_masks([mask], [limit], key)[0]


def _ohem_random_presample(pos_mask, neg_mask, num_hard_positive,
                           num_hard_negative, key):
    """Random 2k pre-sampling of both OHEM sides from one joint draw."""
    cats, lims = [], []
    if num_hard_positive != -1:
        cats.append(pos_mask)
        lims.append(2 * num_hard_positive)
    if num_hard_negative != -1:
        cats.append(neg_mask)
        lims.append(2 * num_hard_negative)
    if not cats:
        return pos_mask, neg_mask
    outs = _random_subsample_masks(cats, lims, key)
    if num_hard_positive != -1:
        pos_mask = outs.pop(0)
    if num_hard_negative != -1:
        neg_mask = outs.pop(0)
    return pos_mask, neg_mask


def _weighted_topk_sum(values, weights, k):
    """Sum of the ``min(k, Σweights)`` largest elements of the *multiset* in
    which ``values[i]`` occurs ``weights[i]`` times (weights int ≥ 0).

    Same 32-bit threshold binary search as :func:`_masked_topk_sum`, with
    occurrence counts replacing the boolean mask — each count pass sums
    weights instead of counting elements. Gradients flow into ``values``
    through the weighted sums (weights are integer counts, no gradient).
    """
    w = weights.astype(jnp.int32).reshape(-1)
    v = values.astype(jnp.float32).reshape(-1)
    n = jnp.sum(w)
    if k == -1:
        return jnp.sum(w.astype(jnp.float32) * v), n

    keys = jnp.where(w > 0, _sortable_key(v), jnp.uint32(0))

    def bit_step(i, t):
        cand = t | (jnp.uint32(1) << (31 - i))
        cnt = jnp.sum(jnp.where(keys >= cand, w, 0))
        return jnp.where(cnt >= k, cand, t)

    t = jax.lax.fori_loop(0, 32, bit_step, jnp.uint32(0))

    above = keys > t
    wf = w.astype(jnp.float32)
    cnt_above = jnp.sum(jnp.where(above, w, 0))
    total_above = jnp.sum(jnp.where(above, wf * v, 0.0))
    kept = jnp.minimum(k, n)
    # Threshold ties: as in _masked_topk_sum, express the partial tie take
    # through the tied VALUES so gradients reach every tied element.
    ties = (keys == t) & (w > 0) & (t > 0)
    cnt_ties = jnp.sum(jnp.where(ties, w, 0))
    sum_ties = jnp.sum(jnp.where(ties, wf * v, 0.0))
    n_take = jnp.maximum(kept - cnt_above, 0)
    frac = n_take.astype(jnp.float32) / jnp.maximum(cnt_ties, 1).astype(jnp.float32)
    return total_above + frac * sum_ties, kept


def _block_sum(x, block):
    """Sum over non-overlapping ``block×block`` tiles of ``[..., H, W]``."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // block, block, w // block, block)
    return x.sum(axis=(-3, -1))


def _cell_ce_values(logits4, weight=None):
    """``[..., C+1]`` per-class CE value table: ``CE(logits, c)`` for each
    class plus an OVERFLOW column (index C) holding the loss of a target
    outside ``[0, C)`` — torch/unpooled semantics: the one-hot gold select
    yields 0, so the loss is plain ``logsumexp`` (and the class-weight lookup
    yields 0, zeroing the weighted loss)."""
    logits4 = logits4.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits4, axis=-1, keepdims=True)
    vals = logz - logits4
    if weight is not None:
        vals = vals * jnp.asarray(weight, jnp.float32)
        over = jnp.zeros_like(logz)
    else:
        over = logz
    return jnp.concatenate([vals, over], axis=-1)


def _class_count_masks(targets, c):
    """Per-class pixel masks incl. the overflow bucket (targets ∉ [0, C))."""
    masks = [targets == ci for ci in range(c)]
    masks.append((targets < 0) | (targets >= c))
    return masks


def cross_entropy_ohem_pooled(
    logits4: jax.Array,
    targets: jax.Array,
    *,
    block: int,
    num_hard_positive: int = -1,
    num_hard_negative: int = -1,
    weight=None,
    random: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """:func:`cross_entropy_ohem` over block-upsampled logits, exactly, at
    cell cost.

    Equals ``cross_entropy_ohem(upsample_nearest(logits4, block).reshape(-1,
    C), targets.reshape(-1), all_valid, ...)`` (same PRNG draws when
    ``random=True``) without ever materialising full-resolution logits or
    losses: within a ``block×block`` tile every pixel shares the cell's
    logits, so per-pixel CE takes at most C distinct values per cell. The
    selection machinery (random pre-sample masks) stays at pixel resolution
    (integer work only); the loss reduction runs on the ``[B, h, w, C]``
    value table weighted by per-(cell, class) pixel counts. Gradients flow
    only through the cell-level table — the backward pass never touches a
    full-resolution tensor.

    Args:
        logits4: ``[B, h, w, C]`` cell logits.
        targets: ``[B, h·block, w·block]`` int pixel labels.
    """
    c = logits4.shape[-1]
    vals = _cell_ce_values(logits4, weight)  # [B, h, w, C+1]
    cmasks = _class_count_masks(targets, c)

    if num_hard_positive == -1 and num_hard_negative == -1:
        counts = jnp.stack(
            [_block_sum(m.astype(jnp.int32), block) for m in cmasks], axis=-1
        )  # [B, h, w, C+1]
        total = jnp.sum(counts.astype(jnp.float32) * vals)
        if weight is not None:
            w_ext = jnp.concatenate(
                [jnp.asarray(weight, jnp.float32), jnp.zeros((1,))]
            )
            wsum = jnp.sum(counts.astype(jnp.float32) * w_ext)
            return total / jnp.maximum(wsum, 1e-12)
        return total / jnp.maximum(jnp.sum(counts).astype(jnp.float32), 1.0)

    pos_mask = (targets != 0).reshape(-1)
    neg_mask = (targets == 0).reshape(-1)
    if random:
        assert key is not None, "ohem random sampling needs a PRNG key"
        pos_mask, neg_mask = _ohem_random_presample(
            pos_mask, neg_mask, num_hard_positive, num_hard_negative, key
        )
    pos_mask = pos_mask.reshape(targets.shape)
    neg_mask = neg_mask.reshape(targets.shape)

    # Per-(cell, class) pixel counts of each side's (possibly subsampled)
    # selection. The negative side only ever holds class-0 pixels; the
    # positive side covers classes 1..C-1 plus the overflow bucket.
    pos_counts = jnp.stack(
        [
            _block_sum((pos_mask & m).astype(jnp.int32), block)
            for m in cmasks[1:]
        ],
        axis=-1,
    )
    neg_counts = _block_sum(neg_mask.astype(jnp.int32), block)[..., None]

    pos_sum, pos_n = _weighted_topk_sum(vals[..., 1:], pos_counts, num_hard_positive)
    neg_sum, neg_n = _weighted_topk_sum(vals[..., :1], neg_counts, num_hard_negative)
    total_n = (pos_n + neg_n).astype(jnp.float32)
    return (pos_sum + neg_sum) / jnp.maximum(total_n, 1.0)


def cross_entropy_random_sample_pooled(
    logits4: jax.Array,
    targets: jax.Array,
    *,
    block: int,
    sample_list=None,
    weight=None,
    key: jax.Array | None = None,
) -> jax.Array:
    """:func:`cross_entropy_random_sample` over block-upsampled logits,
    exactly, at cell cost (see :func:`cross_entropy_ohem_pooled`)."""
    c = logits4.shape[-1]
    vals = _cell_ce_values(logits4, weight)  # [B, h, w, C+1]
    cmasks = _class_count_masks(targets, c)

    if sample_list is None:
        counts = jnp.stack(
            [_block_sum(m.astype(jnp.int32), block) for m in cmasks], axis=-1
        )
        total = jnp.sum(counts.astype(jnp.float32) * vals)
        return total / jnp.maximum(jnp.sum(counts).astype(jnp.float32), 1.0)

    assert key is not None, "random sampling needs a PRNG key"
    num_cats = len(sample_list)
    flat = targets.reshape(-1)
    if num_cats == 2 and c >= 2:
        cat_masks = [flat == 0, flat != 0]
        # category loss value for a pixel is CE at its own class, so the
        # "!= 0" category needs per-class counts (incl. the overflow bucket,
        # which the unpooled loss also sweeps into the != 0 category).
        cat_classes = [[0], list(range(1, c + 1))]
    else:
        assert num_cats == c, (
            f"sample_list length {num_cats} must be 2 or match the class "
            f"dimension {c}"
        )
        cat_masks = [flat == i for i in range(num_cats)]
        cat_classes = [[i] for i in range(num_cats)]

    kept_list = _random_subsample_masks(cat_masks, list(sample_list), key)
    total = jnp.zeros((), jnp.float32)
    count = jnp.zeros((), jnp.float32)
    for kept, classes in zip(kept_list, cat_classes):
        kept = kept.reshape(targets.shape)
        for ci in classes:
            kc = _block_sum(
                (kept & cmasks[ci]).astype(jnp.int32), block
            ).astype(jnp.float32)
            total = total + jnp.sum(kc * vals[..., ci])
            count = count + jnp.sum(kc)
    return total / jnp.maximum(count, 1.0)


def bce_ohem_pooled(
    logits4: jax.Array,
    targets: jax.Array,
    gate: jax.Array,
    *,
    block: int,
    num_hard_positive: int = -1,
    num_hard_negative: int = -1,
    random: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """:func:`bce_ohem` over block-upsampled logits, exactly, at cell cost.

    ``logits4``: ``[B, h, w]`` cell logits; ``targets``: ``[B, h·block,
    w·block]`` binary pixel targets; ``gate``: pixel validity (the reference
    gates on the predicted positive mask, semantic_segmentation_head.py:221).
    Per-cell BCE takes exactly two values (target 0 / target 1), so the
    reduction runs on a ``[B, h, w, 2]`` table weighted by gated pixel counts.
    """
    logits4 = logits4.astype(jnp.float32)
    # vals[..., j] = BCE(logit, target=j)
    vals = jnp.stack(
        [_bce_per_example(logits4, jnp.full_like(logits4, t)) for t in (0.0, 1.0)],
        axis=-1,
    )

    tpos = targets != 0
    pos_mask = (gate & tpos).reshape(-1)
    neg_mask = (gate & ~tpos).reshape(-1)
    if num_hard_positive == -1 and num_hard_negative == -1:
        pc = _block_sum(pos_mask.reshape(targets.shape).astype(jnp.int32), block)
        nc = _block_sum(neg_mask.reshape(targets.shape).astype(jnp.int32), block)
        total = jnp.sum(pc.astype(jnp.float32) * vals[..., 1]) + jnp.sum(
            nc.astype(jnp.float32) * vals[..., 0]
        )
        n = jnp.sum(pc) + jnp.sum(nc)
        return total / jnp.maximum(n.astype(jnp.float32), 1.0)

    if random:
        assert key is not None
        pos_mask, neg_mask = _ohem_random_presample(
            pos_mask, neg_mask, num_hard_positive, num_hard_negative, key
        )
    pos_counts = _block_sum(pos_mask.reshape(targets.shape).astype(jnp.int32), block)
    neg_counts = _block_sum(neg_mask.reshape(targets.shape).astype(jnp.int32), block)

    pos_sum, pos_n = _weighted_topk_sum(vals[..., 1], pos_counts, num_hard_positive)
    neg_sum, neg_n = _weighted_topk_sum(vals[..., 0], neg_counts, num_hard_negative)
    total_n = (pos_n + neg_n).astype(jnp.float32)
    return (pos_sum + neg_sum) / jnp.maximum(total_n, 1.0)


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
        pos_mask, neg_mask = _ohem_random_presample(
            pos_mask, neg_mask, num_hard_positive, num_hard_negative, key
        )
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

    kept_list = _random_subsample_masks(cat_masks, list(sample_list), key)
    total = jnp.zeros((), jnp.float32)
    count = jnp.zeros((), jnp.float32)
    for kept in kept_list:
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
        pos_mask, neg_mask = _ohem_random_presample(
            pos_mask, neg_mask, num_hard_positive, num_hard_negative, key
        )
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
    kept_list = _random_subsample_masks(cat_masks, samples, key)
    total = jnp.zeros((), jnp.float32)
    count = jnp.zeros((), jnp.float32)
    for kept in kept_list:
        total = total + jnp.sum(jnp.where(kept, losses, 0.0))
        count = count + jnp.sum(kept.astype(jnp.float32))
    return total / jnp.maximum(count, 1.0)
