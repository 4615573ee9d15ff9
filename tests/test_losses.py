"""Loss parity vs torch reference formulas (torch used host-side only)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from interspeech_ser_tpu.train import losses

RNG = np.random.default_rng(0)


def _logits_targets(b=16, c=8):
    logits = RNG.normal(size=(b, c)).astype(np.float32)
    targets = RNG.integers(0, c, size=b)
    return logits, targets


class TestWeightedCE:
    def test_unweighted(self):
        logits, targets = _logits_targets()
        ours = losses.weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
        ref = F.cross_entropy(torch.tensor(logits), torch.tensor(targets))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)

    def test_weighted_denominator(self):
        # torch divides by sum of selected class weights, not batch size.
        logits, targets = _logits_targets()
        w = RNG.uniform(0.1, 3.0, size=8).astype(np.float32)
        ours = losses.weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w)
        )
        ref = F.cross_entropy(torch.tensor(logits), torch.tensor(targets), weight=torch.tensor(w))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)

    def test_sample_mask_equals_subset(self):
        logits, targets = _logits_targets(16)
        w = RNG.uniform(0.1, 3.0, size=8).astype(np.float32)
        mask = np.zeros(16, dtype=np.float32)
        mask[:10] = 1.0
        masked = losses.weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w), jnp.asarray(mask)
        )
        subset = losses.weighted_cross_entropy(
            jnp.asarray(logits[:10]), jnp.asarray(targets[:10]), jnp.asarray(w)
        )
        np.testing.assert_allclose(float(masked), float(subset), rtol=1e-6)


class TestFocal:
    @pytest.mark.parametrize("dynamic_alpha", [False, True])
    def test_matches_reference_formula(self, dynamic_alpha):
        logits, targets = _logits_targets()
        ours = losses.focal_loss(
            jnp.asarray(logits), jnp.asarray(targets), alpha=1.0, gamma=2.0,
            dynamic_alpha=dynamic_alpha,
        )
        probs = torch.softmax(torch.tensor(logits), dim=1)
        pt = probs[torch.arange(len(targets)), torch.tensor(targets)]
        ce = -torch.log(pt + 1e-8)
        mod = (1 - pt) ** 2.0
        alpha = (1 - pt) if dynamic_alpha else 1.0
        ref = (alpha * mod * ce).mean()
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


class TestSoftMargin:
    def test_matches_torch(self):
        logits = RNG.normal(size=(12, 1)).astype(np.float32)
        y = (2 * RNG.integers(0, 2, size=(12, 1)) - 1).astype(np.float32)
        ours = losses.soft_margin_loss(jnp.asarray(logits), jnp.asarray(y))
        ref = torch.nn.SoftMarginLoss()(torch.tensor(logits), torch.tensor(y))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


class TestSmoothedCE:
    def test_matches_reference_formula(self):
        logits, targets = _logits_targets()
        w = RNG.uniform(0.1, 3.0, size=8).astype(np.float32)
        ours = losses.smoothed_cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), smoothing=0.1,
            class_weights=jnp.asarray(w),
        )
        # reference formula: plain mean over samples, weights scale per-class.
        one_hot = torch.zeros(16, 8).scatter_(1, torch.tensor(targets)[:, None], 1)
        one_hot = 0.9 * one_hot + 0.1 / 8
        logp = torch.log_softmax(torch.tensor(logits), dim=-1)
        ref = ((-(one_hot * logp)) * torch.tensor(w)[None, :]).sum(-1).mean()
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


class TestHierarchical:
    def test_matches_reference_formula(self):
        logits, targets = _logits_targets()
        sim = np.asarray(losses.EMOTION_SIMILARITY)
        ours = losses.hierarchical_loss(jnp.asarray(logits), jnp.asarray(targets))
        lt, tt = torch.tensor(logits), torch.tensor(targets)
        ce = F.cross_entropy(lt, tt)
        soft = F.one_hot(tt, 8).float() @ torch.tensor(sim)
        soft = soft / soft.sum(1, keepdim=True)
        kl = F.kl_div(F.log_softmax(lt, dim=-1), soft, reduction="batchmean")
        np.testing.assert_allclose(float(ours), float(ce + 0.1 * kl), rtol=1e-5)


class TestCKA:
    def test_matches_reference_formula(self):
        a = RNG.normal(size=(16, 32)).astype(np.float32)
        b = (a @ RNG.normal(size=(32, 24)).astype(np.float32)).astype(np.float32)
        ours = losses.cka_loss(jnp.asarray(a), jnp.asarray(b))
        ta, tb = torch.tensor(a), torch.tensor(b)
        K, L = ta @ ta.T, tb @ tb.T
        n = K.shape[0]
        H = torch.eye(n) - torch.ones(n, n) / n
        Kc, Lc = H @ K @ H, H @ L @ H
        cka = torch.trace(Kc @ Lc) / (
            torch.sqrt(torch.trace(Kc @ Kc) * torch.trace(Lc @ Lc)) + 1e-8
        )
        np.testing.assert_allclose(float(ours), float(1 - cka), rtol=1e-4)

    def test_linear_map_alignment_high(self):
        a = RNG.normal(size=(16, 32)).astype(np.float32)
        assert float(losses.cka_loss(jnp.asarray(a), jnp.asarray(2 * a))) < 1e-5

    def test_sample_mask_equals_unpadded(self):
        """Masked CKA over a padded batch == plain CKA over valid rows
        (static-shape batches pad rows to a mesh multiple; junk rows
        must not leak into the batch-global statistic)."""
        a = RNG.normal(size=(11, 32)).astype(np.float32)
        b = RNG.normal(size=(11, 24)).astype(np.float32)
        pad_a = np.concatenate([a, RNG.normal(size=(5, 32)).astype(np.float32)])
        pad_b = np.concatenate([b, RNG.normal(size=(5, 24)).astype(np.float32)])
        smask = np.concatenate([np.ones(11), np.zeros(5)]).astype(np.float32)
        ref = float(losses.cka_loss(jnp.asarray(a), jnp.asarray(b)))
        got = float(
            losses.cka_loss(jnp.asarray(pad_a), jnp.asarray(pad_b), jnp.asarray(smask))
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5)


class TestDiffF1:
    def test_matches_reference_formula(self):
        logits = RNG.normal(size=(16, 8)).astype(np.float32)
        onehot = np.eye(8, dtype=np.float32)[RNG.integers(0, 8, 16)]
        ours = losses.diff_f1_loss(jnp.asarray(logits), jnp.asarray(onehot))
        p = torch.sigmoid(torch.tensor(logits))
        t = torch.tensor(onehot)
        tp = (p * t).sum(0)
        fp = (p * (1 - t)).sum(0)
        fn = ((1 - p) * t).sum(0)
        prec = tp / (tp + fp + 1e-7)
        rec = tp / (tp + fn + 1e-7)
        f1 = 2 * prec * rec / (prec + rec + 1e-7)
        np.testing.assert_allclose(float(ours), float(1 - f1.mean()), rtol=1e-5)


class TestCCCLoss:
    def test_perfect_prediction_is_zero(self):
        x = RNG.normal(size=(64, 3)).astype(np.float32)
        val = float(losses.ccc_loss(jnp.asarray(x), jnp.asarray(x)))
        assert abs(val) < 1e-4

    def test_sample_mask_equals_unpadded(self):
        """Masked CCC over a padded batch == plain CCC over valid rows
        (batch-global moments must exclude static-shape padding)."""
        pred = RNG.normal(size=(13, 3)).astype(np.float32)
        lab = RNG.normal(size=(13, 3)).astype(np.float32)
        pad_p = np.concatenate([pred, RNG.normal(size=(3, 3)).astype(np.float32)])
        pad_l = np.concatenate([lab, np.zeros((3, 3), np.float32)])
        smask = np.concatenate([np.ones(13), np.zeros(3)]).astype(np.float32)
        ref = float(losses.ccc_loss(jnp.asarray(pred), jnp.asarray(lab)))
        got = float(
            losses.ccc_loss(jnp.asarray(pad_p), jnp.asarray(pad_l), jnp.asarray(smask))
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_matches_population_moments(self):
        pred = RNG.normal(size=(64, 3)).astype(np.float32)
        lab = RNG.normal(size=(64, 3)).astype(np.float32)
        ours = float(losses.ccc_loss(jnp.asarray(pred), jnp.asarray(lab)))
        total = 0.0
        for i in range(3):
            p, l = pred[:, i].astype(np.float64), lab[:, i].astype(np.float64)
            cov = np.mean((p - p.mean()) * (l - l.mean()))
            c = 2 * cov / (p.var() + l.var() + (p.mean() - l.mean()) ** 2 + 1e-9)
            total += 1 - c
        np.testing.assert_allclose(ours, total, rtol=1e-4)


class TestSpeakerLosses:
    def test_angle_proto_separable_lower(self):
        # well-separated speakers should give lower loss than random
        d = 16
        sep = np.stack(
            [RNG.normal(loc=5 * i, size=(4, d)) for i in range(6)], axis=0
        ).astype(np.float32)
        rand = RNG.normal(size=(6, 4, d)).astype(np.float32)
        assert float(losses.angle_proto_loss(jnp.asarray(sep))) < float(
            losses.angle_proto_loss(jnp.asarray(rand))
        )

    def test_ge2e_separable_lower(self):
        d = 16
        sep = np.stack(
            [RNG.normal(loc=5 * i, size=(4, d)) for i in range(6)], axis=0
        ).astype(np.float32)
        rand = RNG.normal(size=(6, 4, d)).astype(np.float32)
        assert float(losses.ge2e_loss(jnp.asarray(sep))) < float(
            losses.ge2e_loss(jnp.asarray(rand))
        )
