"""Tests for OHEM losses and the scan-based CRF vs brute-force oracles."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from vibertgrid_tpu.ops.losses import (
    bce_ohem,
    bce_random_sample,
    cross_entropy_ohem,
    cross_entropy_random_sample,
)
from vibertgrid_tpu.ops.crf import (
    crf_decode_batch,
    crf_nll_batch,
    init_transitions,
    NEG,
)

RNG = np.random.default_rng(1)


def ce_np(logits, targets):
    z = logits - logits.max(-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    return -logp[np.arange(len(targets)), targets]


def bce_np(logits, targets):
    return np.maximum(logits, 0) - logits * targets + np.log1p(np.exp(-np.abs(logits)))


class TestCrossEntropyOHEM:
    def test_plain_mean_matches(self):
        logits = RNG.standard_normal((20, 5)).astype(np.float32)
        targets = RNG.integers(0, 5, 20)
        valid = np.ones(20, bool)
        got = cross_entropy_ohem(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid))
        np.testing.assert_allclose(float(got), ce_np(logits, targets).mean(), rtol=1e-5)

    def test_padding_excluded(self):
        logits = RNG.standard_normal((20, 5)).astype(np.float32)
        targets = RNG.integers(0, 5, 20)
        valid = np.zeros(20, bool)
        valid[:12] = True
        got = cross_entropy_ohem(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid))
        np.testing.assert_allclose(
            float(got), ce_np(logits[:12], targets[:12]).mean(), rtol=1e-5
        )

    def test_topk_hardest(self):
        logits = RNG.standard_normal((30, 4)).astype(np.float32)
        targets = RNG.integers(0, 4, 30)
        valid = np.ones(30, bool)
        k = 3
        got = cross_entropy_ohem(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid),
            num_hard_positive=k, num_hard_negative=k,
        )
        losses = ce_np(logits, targets)
        pos = np.sort(losses[targets != 0])[::-1]
        neg = np.sort(losses[targets == 0])[::-1]
        kp, kn = min(k, len(pos)), min(k, len(neg))
        want = (pos[:kp].sum() + neg[:kn].sum()) / (kp + kn)
        np.testing.assert_allclose(float(got), want, rtol=1e-5)

    def test_k_exceeds_available(self):
        logits = RNG.standard_normal((6, 3)).astype(np.float32)
        targets = np.array([0, 0, 0, 0, 1, 2])
        valid = np.ones(6, bool)
        got = cross_entropy_ohem(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid),
            num_hard_positive=10, num_hard_negative=10,
        )
        np.testing.assert_allclose(float(got), ce_np(logits, targets).mean(), rtol=1e-5)

    def test_weighted_plain(self):
        logits = RNG.standard_normal((10, 3)).astype(np.float32)
        targets = RNG.integers(0, 3, 10)
        valid = np.ones(10, bool)
        w = np.array([0.5, 1.0, 2.0], np.float32)
        got = cross_entropy_ohem(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid), weight=w
        )
        losses = ce_np(logits, targets) * w[targets]
        np.testing.assert_allclose(float(got), losses.sum() / w[targets].sum(), rtol=1e-5)

    def test_random_presample_deterministic_and_bounded(self):
        logits = RNG.standard_normal((200, 4)).astype(np.float32)
        targets = RNG.integers(0, 4, 200)
        valid = np.ones(200, bool)
        key = jax.random.PRNGKey(7)
        a = cross_entropy_ohem(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid),
            num_hard_positive=4, num_hard_negative=4, random=True, key=key,
        )
        b = cross_entropy_ohem(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid),
            num_hard_positive=4, num_hard_negative=4, random=True, key=key,
        )
        assert float(a) == float(b)
        losses = ce_np(logits, targets)
        assert float(a) <= losses.max() + 1e-5


class TestRandomSampleCE:
    def test_sample_ge_population_is_plain_mean(self):
        logits = RNG.standard_normal((15, 3)).astype(np.float32)
        targets = RNG.integers(0, 3, 15)
        valid = np.ones(15, bool)
        got = cross_entropy_random_sample(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid),
            sample_list=[100, 100, 100], key=jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(float(got), ce_np(logits, targets).mean(), rtol=1e-5)

    def test_two_category_split(self):
        logits = RNG.standard_normal((50, 3)).astype(np.float32)
        targets = RNG.integers(0, 3, 50)
        valid = np.ones(50, bool)
        got = cross_entropy_random_sample(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid),
            sample_list=[1000, 1000], key=jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(float(got), ce_np(logits, targets).mean(), rtol=1e-5)


class TestBCE:
    def test_plain(self):
        logits = RNG.standard_normal(30).astype(np.float32)
        targets = (RNG.random(30) > 0.5).astype(np.float32)
        valid = np.ones(30, bool)
        got = bce_ohem(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid))
        np.testing.assert_allclose(float(got), bce_np(logits, targets).mean(), rtol=1e-5)

    def test_ohem(self):
        logits = RNG.standard_normal(40).astype(np.float32)
        targets = (RNG.random(40) > 0.5).astype(np.float32)
        valid = np.ones(40, bool)
        k = 5
        got = bce_ohem(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid),
            num_hard_positive=k, num_hard_negative=k,
        )
        losses = bce_np(logits, targets)
        pos = np.sort(losses[targets != 0])[::-1][:k]
        neg = np.sort(losses[targets == 0])[::-1][:k]
        want = (pos.sum() + neg.sum()) / (len(pos) + len(neg))
        np.testing.assert_allclose(float(got), want, rtol=1e-4)

    def test_random_sample_full_keep(self):
        logits = RNG.standard_normal(25).astype(np.float32)
        targets = (RNG.random(25) > 0.5).astype(np.float32)
        valid = np.ones(25, bool)
        got = bce_random_sample(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid),
            sample_list=[100, 100], key=jax.random.PRNGKey(3),
        )
        np.testing.assert_allclose(float(got), bce_np(logits, targets).mean(), rtol=1e-5)


def brute_force_logz(trans, feats, length, start, stop):
    k = trans.shape[0]
    scores = []
    for path in itertools.product(range(k), repeat=length):
        s = trans[path[0], start] + feats[0, path[0]]
        for t in range(1, length):
            s += trans[path[t], path[t - 1]] + feats[t, path[t]]
        s += trans[stop, path[-1]]
        scores.append(s)
    m = max(scores)
    return m + np.log(np.sum(np.exp(np.array(scores) - m)))


def brute_force_best(trans, feats, length, start, stop):
    k = trans.shape[0]
    best, best_path = -np.inf, None
    for path in itertools.product(range(k), repeat=length):
        s = trans[path[0], start] + feats[0, path[0]]
        for t in range(1, length):
            s += trans[path[t], path[t - 1]] + feats[t, path[t]]
        s += trans[stop, path[-1]]
        if s > best:
            best, best_path = s, path
    return best, list(best_path)


class TestCRF:
    def setup_method(self):
        self.k = 5  # 3 classes + START + STOP
        self.trans = np.asarray(init_transitions(jax.random.PRNGKey(0), self.k))

    def test_nll_matches_brute_force(self):
        t = 4
        feats = RNG.standard_normal((2, t, self.k)).astype(np.float32)
        tags = RNG.integers(0, 3, (2, t)).astype(np.int32)
        lengths = np.array([4, 3], np.int32)
        got = crf_nll_batch(
            jnp.asarray(self.trans), jnp.asarray(feats), jnp.asarray(tags),
            jnp.asarray(lengths),
        )
        start, stop = self.k - 2, self.k - 1
        wants = []
        for i in range(2):
            ln = lengths[i]
            logz = brute_force_logz(self.trans, feats[i], ln, start, stop)
            path = tags[i, :ln]
            gold = self.trans[path[0], start] + feats[i, 0, path[0]]
            for tt in range(1, ln):
                gold += self.trans[path[tt], path[tt - 1]] + feats[i, tt, path[tt]]
            gold += self.trans[stop, path[-1]]
            wants.append((logz - gold) / ln)
        np.testing.assert_allclose(float(got), np.mean(wants), rtol=1e-4)

    def test_viterbi_matches_brute_force(self):
        t = 5
        feats = RNG.standard_normal((1, t, self.k)).astype(np.float32) * 3
        lengths = np.array([t], np.int32)
        scores, paths = crf_decode_batch(
            jnp.asarray(self.trans), jnp.asarray(feats), jnp.asarray(lengths)
        )
        start, stop = self.k - 2, self.k - 1
        want_score, want_path = brute_force_best(self.trans, feats[0], t, start, stop)
        np.testing.assert_allclose(float(scores[0]), want_score, rtol=1e-4)
        assert list(np.asarray(paths[0])) == want_path

    def test_viterbi_masked_length(self):
        t = 6
        feats = RNG.standard_normal((1, t, self.k)).astype(np.float32) * 3
        lengths = np.array([4], np.int32)
        scores, paths = crf_decode_batch(
            jnp.asarray(self.trans), jnp.asarray(feats), jnp.asarray(lengths)
        )
        start, stop = self.k - 2, self.k - 1
        want_score, want_path = brute_force_best(self.trans, feats[0], 4, start, stop)
        np.testing.assert_allclose(float(scores[0]), want_score, rtol=1e-4)
        assert list(np.asarray(paths[0])[:4]) == want_path

    def test_constraints(self):
        assert np.all(self.trans[self.k - 2, :] == NEG)
        assert np.all(self.trans[:, self.k - 1] == NEG)


class TestMaskedTopkSum:
    """Sortless threshold top-k vs a lax.top_k oracle, including ties."""

    def _oracle(self, losses, mask, k):
        import jax
        vals = jnp.where(jnp.asarray(mask), jnp.asarray(losses), -jnp.inf).reshape(-1)
        topv, _ = jax.lax.top_k(vals, min(k, vals.size))
        finite = jnp.isfinite(topv)
        return float(jnp.sum(jnp.where(finite, topv, 0.0)))

    def test_matches_topk_with_ties(self):
        from vibertgrid_tpu.ops.losses import _masked_topk_sum

        rng = np.random.default_rng(0)
        for trial in range(6):
            n = 257
            # quantize to force duplicate values straddling the threshold
            losses = np.round(rng.standard_normal(n) * 4) / 4
            mask = rng.random(n) > 0.3
            for k in (1, 7, 64, 300):
                got, kept = _masked_topk_sum(
                    jnp.asarray(losses, jnp.float32), jnp.asarray(mask), k
                )
                want = self._oracle(losses.astype(np.float32), mask, k)
                assert abs(float(got) - want) < 1e-4, (trial, k, float(got), want)
                assert int(kept) == min(k, int(mask.sum()))

    def test_empty_mask_and_negatives(self):
        from vibertgrid_tpu.ops.losses import _masked_topk_sum

        losses = jnp.asarray([-3.0, -1.5, -0.0, 2.0], jnp.float32)
        got, kept = _masked_topk_sum(losses, jnp.zeros(4, bool), 2)
        assert float(got) == 0.0 and int(kept) == 0
        got, kept = _masked_topk_sum(losses, jnp.ones(4, bool), 2)
        assert abs(float(got) - 2.0) < 1e-6 and int(kept) == 2  # 2.0 + (-0.0)
        got, kept = _masked_topk_sum(losses, jnp.ones(4, bool), 10)
        assert abs(float(got) - (-2.5)) < 1e-6 and int(kept) == 4


class TestRandomSubsampleMask:
    def test_exact_count_and_subset(self):
        import jax
        from vibertgrid_tpu.ops.losses import _random_subsample_mask

        rng = np.random.default_rng(1)
        mask = jnp.asarray(rng.random(1000) > 0.4)
        for limit in (1, 50, 400, 2000):
            out = _random_subsample_mask(mask, limit, jax.random.PRNGKey(7))
            out = np.asarray(out)
            assert out.sum() == min(limit, int(np.asarray(mask).sum()))
            assert not np.any(out & ~np.asarray(mask))

    def test_uniformity(self):
        """Each masked element selected with ≈ limit/n probability."""
        import jax
        from vibertgrid_tpu.ops.losses import _random_subsample_mask

        mask = jnp.ones(200, bool)
        counts = np.zeros(200)
        trials = 300
        for i in range(trials):
            counts += np.asarray(
                _random_subsample_mask(mask, 50, jax.random.PRNGKey(i))
            )
        p = counts / trials  # expect 0.25
        assert abs(p.mean() - 0.25) < 1e-9  # exact count each trial
        assert p.std() < 0.06, p.std()  # no element strongly favoured

    def test_gradient_flows_to_threshold_ties(self):
        """The tie contribution must carry gradient (the aux losses run over
        4x-upsampled maps where equal values are pervasive): d/dx of the
        top-k sum distributes over tied elements instead of vanishing."""
        import jax
        from vibertgrid_tpu.ops.losses import _masked_topk_sum

        losses = jnp.asarray([2.0, 2.0, 2.0, 2.0, 1.0], jnp.float32)
        mask = jnp.ones(5, bool)
        g = jax.grad(lambda l: _masked_topk_sum(l, mask, 3)[0])(losses)
        g = np.asarray(g)
        # four ties at the threshold, three taken → 3/4 weight each
        np.testing.assert_allclose(g[:4], 0.75, rtol=1e-6)
        assert g[4] == 0.0
        # distinct values: every kept element gets gradient 1
        losses2 = jnp.asarray([4.0, 3.0, 1.0, 2.0], jnp.float32)
        g2 = np.asarray(
            jax.grad(lambda l: _masked_topk_sum(l, jnp.ones(4, bool), 2)[0])(losses2)
        )
        np.testing.assert_allclose(g2, [1.0, 1.0, 0.0, 0.0], atol=1e-6)


def _upsample(x, block):
    return x.repeat(block, axis=1).repeat(block, axis=2)


class TestPooledLosses:
    """The *_pooled variants must equal the full-resolution losses bit-for-bit
    (same PRNG draws): within a block×block tile every pixel shares the cell's
    logits, so the pooled reformulation is a regrouping, not an approximation.
    """

    B, H4, W4, C, BLOCK = 2, 8, 12, 5, 4

    def _cells(self, c=None, with_overflow=False):
        c = c or self.C
        logits4 = RNG.standard_normal((self.B, self.H4, self.W4, c)).astype(
            np.float32
        )
        targets = RNG.integers(
            0, c, (self.B, self.H4 * self.BLOCK, self.W4 * self.BLOCK)
        ).astype(np.int32)
        if with_overflow:
            # a few out-of-range class ids (dataset tag id >= num_classes):
            # unpooled CE gives loss = logsumexp for them; pooled must match.
            targets[0, :3, :2] = c + 1
        return jnp.asarray(logits4), jnp.asarray(targets)

    def _full(self, logits4, c):
        full = _upsample(np.asarray(logits4), self.BLOCK).reshape(-1, c)
        return jnp.asarray(full)

    def test_ohem_matches_fullres(self):
        from vibertgrid_tpu.ops.losses import cross_entropy_ohem_pooled

        for kp, kn, random in [(-1, -1, False), (40, 60, False), (7, 5, True),
                               (10**7, 10**7, False)]:
            logits4, targets = self._cells(with_overflow=True)
            key = jax.random.PRNGKey(3)
            valid = jnp.ones((targets.size,), bool)
            want = cross_entropy_ohem(
                self._full(logits4, self.C), targets.reshape(-1), valid,
                num_hard_positive=kp, num_hard_negative=kn, random=random,
                key=key,
            )
            got = cross_entropy_ohem_pooled(
                logits4, targets, block=self.BLOCK,
                num_hard_positive=kp, num_hard_negative=kn, random=random,
                key=key,
            )
            np.testing.assert_allclose(float(got), float(want), rtol=2e-6)

    def test_ohem_weighted_matches(self):
        from vibertgrid_tpu.ops.losses import cross_entropy_ohem_pooled

        w = [0.5, 1.0, 2.0, 1.5, 0.25]
        for kp, kn in [(-1, -1), (30, 50)]:
            logits4, targets = self._cells()
            valid = jnp.ones((targets.size,), bool)
            want = cross_entropy_ohem(
                self._full(logits4, self.C), targets.reshape(-1), valid,
                num_hard_positive=kp, num_hard_negative=kn, weight=w,
            )
            got = cross_entropy_ohem_pooled(
                logits4, targets, block=self.BLOCK,
                num_hard_positive=kp, num_hard_negative=kn, weight=w,
            )
            np.testing.assert_allclose(float(got), float(want), rtol=2e-6)

    def test_random_sample_matches_fullres(self):
        from vibertgrid_tpu.ops.losses import cross_entropy_random_sample_pooled

        for c, sample_list in [(3, [17, 23, 11]), (3, [10**7] * 3),
                               (5, [64, 32, 16, 8, 4]), (4, [40, 60])]:
            logits4, targets = self._cells(c, with_overflow=(c == 4))
            key = jax.random.PRNGKey(9)
            valid = jnp.ones((targets.size,), bool)
            want = cross_entropy_random_sample(
                self._full(logits4, c), targets.reshape(-1), valid,
                sample_list=sample_list, key=key,
            )
            got = cross_entropy_random_sample_pooled(
                logits4, targets, block=self.BLOCK,
                sample_list=sample_list, key=key,
            )
            np.testing.assert_allclose(float(got), float(want), rtol=2e-6)

    def test_bce_matches_fullres(self):
        from vibertgrid_tpu.ops.losses import bce_ohem_pooled

        for kp, kn, random in [(-1, -1, False), (25, 40, False), (6, 9, True)]:
            logits4 = RNG.standard_normal((self.B, self.H4, self.W4)).astype(
                np.float32
            )
            targets = (
                RNG.random((self.B, self.H4 * self.BLOCK, self.W4 * self.BLOCK))
                > 0.7
            )
            gate4 = RNG.random((self.B, self.H4, self.W4)) > 0.3
            gate = _upsample(gate4[..., None], self.BLOCK)[..., 0]
            key = jax.random.PRNGKey(5)
            want = bce_ohem(
                jnp.asarray(
                    _upsample(logits4[..., None], self.BLOCK)[..., 0].reshape(-1)
                ),
                jnp.asarray(targets.reshape(-1).astype(np.float32)),
                jnp.asarray(gate.reshape(-1)),
                num_hard_positive=kp, num_hard_negative=kn, random=random,
                key=key,
            )
            got = bce_ohem_pooled(
                jnp.asarray(logits4), jnp.asarray(targets), jnp.asarray(gate),
                block=self.BLOCK, num_hard_positive=kp, num_hard_negative=kn,
                random=random, key=key,
            )
            np.testing.assert_allclose(float(got), float(want), rtol=2e-6)

    def test_ohem_gradients_match_fullres(self):
        from vibertgrid_tpu.ops.losses import cross_entropy_ohem_pooled

        logits4, targets = self._cells()
        valid = jnp.ones((targets.size,), bool)

        def full_loss(l4):
            full = jnp.repeat(jnp.repeat(l4, self.BLOCK, 1), self.BLOCK, 2)
            return cross_entropy_ohem(
                full.reshape(-1, self.C), targets.reshape(-1), valid,
                num_hard_positive=40, num_hard_negative=60,
            )

        def pooled_loss(l4):
            return cross_entropy_ohem_pooled(
                l4, targets, block=self.BLOCK,
                num_hard_positive=40, num_hard_negative=60,
            )

        gw = jax.grad(full_loss)(logits4)
        gg = jax.grad(pooled_loss)(logits4)
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw), atol=1e-6)
