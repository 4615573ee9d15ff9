"""Loss library (JAX) with torch-parity semantics.

Ports the reference's loss surface:
- weighted CE           (reference: benchmark/utils/loss_manager.py:85-91)
- focal ± dynamic alpha (reference: src/losses/loss.py:7-32)
- CKA                   (reference: src/losses/loss.py:34-77)
- differentiable F1     (reference: src/losses/loss.py:79-119)
- hierarchical CE+KL    (reference: src/losses/loss.py:121-176)
- smoothed CE           (reference: src/losses/loss.py:180-242)
- soft margin (ranking) (reference: bin/train_cat_bimodal_lazy_1head_ranking.py:403,431)
- CCC loss              (reference: benchmark/utils/loss_manager.py:51-75)
- GE2E / angular-proto / softmax-proto speaker losses
                        (reference: src/information_encoder/losses.py:7-225)

All classification losses accept an optional ``sample_mask`` (float 0/1 per
row) so statically padded batches — required for fixed-shape TPU compilation —
reduce exactly like the reference's dynamic batches: masked rows contribute
zero to both numerator and denominator.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# 8x8 emotion similarity prior (Angry,Sad,Happy,Surprise,Fear,Disgust,Contempt,
# Neutral), from reference src/losses/loss.py:134-144. Kept as a host numpy
# constant: a module-level jnp array would initialize the JAX backend at
# import time (breaking platform selection in __graft_entry__).
EMOTION_SIMILARITY = np.asarray(
    [
        [1.00, 0.30, 0.10, 0.25, 0.30, 0.60, 0.70, 0.20],
        [0.30, 1.00, 0.10, 0.20, 0.40, 0.30, 0.40, 0.50],
        [0.10, 0.10, 1.00, 0.60, 0.15, 0.10, 0.15, 0.40],
        [0.25, 0.20, 0.60, 1.00, 0.50, 0.20, 0.20, 0.30],
        [0.30, 0.40, 0.15, 0.50, 1.00, 0.40, 0.30, 0.25],
        [0.60, 0.30, 0.10, 0.20, 0.40, 1.00, 0.65, 0.25],
        [0.70, 0.40, 0.15, 0.20, 0.30, 0.65, 1.00, 0.35],
        [0.20, 0.50, 0.40, 0.30, 0.25, 0.25, 0.35, 1.00],
    ],
    dtype=jnp.float32,
)


def _masked_mean(values: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(values)
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1e-12)


def weighted_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch ``CrossEntropyLoss(weight=w)`` semantics.

    Weighted mean reduction divides by the *sum of per-sample class weights*,
    not the batch size (this is what torch does and what the reference relies
    on via ``CE_weight_category``).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    if class_weights is not None:
        w = class_weights[targets]
    else:
        w = jnp.ones_like(nll)
    if sample_mask is not None:
        w = w * sample_mask.astype(w.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def smoothed_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    smoothing: float = 0.0,
    class_weights: Optional[jnp.ndarray] = None,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Label-smoothed CE (reference: src/losses/loss.py:180-242).

    NOTE the reference's reduction here is a plain mean over samples (class
    weights scale per-class log-prob terms, they do NOT change the
    denominator) — different from torch CrossEntropyLoss; replicated exactly.
    """
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    if smoothing > 0:
        one_hot = (1.0 - smoothing) * one_hot + smoothing / num_classes
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    losses = -(one_hot * logp)
    if class_weights is not None:
        losses = losses * class_weights[None, :]
    per_sample = losses.sum(axis=-1)
    return _masked_mean(per_sample, sample_mask)


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 1.0,
    gamma: float = 2.0,
    dynamic_alpha: bool = False,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Softmax-pt focal loss (reference: src/losses/loss.py:7-32)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    pt = jnp.take_along_axis(probs, targets[:, None], axis=-1)[:, 0]
    ce = -jnp.log(pt + 1e-8)
    modulating = (1.0 - pt) ** gamma
    a = (1.0 - pt) if dynamic_alpha else alpha
    per_sample = a * modulating * ce
    return _masked_mean(per_sample, sample_mask)


def soft_margin_loss(
    logits: jnp.ndarray,
    targets_pm1: jnp.ndarray,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch ``SoftMarginLoss``: mean log(1 + exp(-y*x)) over all elements.

    Used by the ranking trainers for the neutral-vs-rest head
    (reference: bin/train_cat_bimodal_lazy_1head_ranking.py:403,431).
    """
    x = logits.astype(jnp.float32)
    y = targets_pm1.astype(jnp.float32)
    per_elem = jnp.logaddexp(0.0, -y * x)
    if sample_mask is not None:
        mask = jnp.broadcast_to(
            sample_mask.reshape(sample_mask.shape + (1,) * (per_elem.ndim - sample_mask.ndim)),
            per_elem.shape,
        )
        return _masked_mean(per_elem, mask)
    return jnp.mean(per_elem)


def hierarchical_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    similarity_weight: float = 0.1,
    similarity_matrix: Optional[jnp.ndarray] = None,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weighted CE + KL to similarity-smoothed targets (src/losses/loss.py:121-176)."""
    sim = EMOTION_SIMILARITY if similarity_matrix is None else similarity_matrix
    ce = weighted_cross_entropy(logits, targets, class_weights, sample_mask)
    one_hot = jax.nn.one_hot(targets, logits.shape[-1], dtype=jnp.float32)
    soft = one_hot @ sim
    soft = soft / soft.sum(axis=1, keepdims=True)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # torch F.kl_div(log_probs, soft, reduction='batchmean'):
    # sum(soft * (log soft - log_probs)) / batch
    kl_per_sample = jnp.sum(soft * (jnp.log(soft + 1e-12) - logp), axis=-1)
    kl = _masked_mean(kl_per_sample, sample_mask)
    return ce + similarity_weight * kl


def svm_ranking_loss(
    logits: jnp.ndarray,  # [B, 2] (female, male) scores
    targets: jnp.ndarray,  # [B] 1 = male, 0 = female
    margin: float = 1.0,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Hinge on the (male − female) score ordering.

    Reference ``SVMRankingLoss`` (bin/old/train_cat_bimodal_lazy_gender_svm
    .py:26-43): loss = mean(clamp(margin − t·(male − female), 0)) with
    t = 2y − 1.
    """
    male = logits[:, 1].astype(jnp.float32)
    female = logits[:, 0].astype(jnp.float32)
    t = 2.0 * targets.astype(jnp.float32) - 1.0
    diff = jnp.maximum(margin - t * (male - female), 0.0)
    return _masked_mean(diff, sample_mask)


def cka_loss(
    feat_a: jnp.ndarray,
    feat_b: jnp.ndarray,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """1 - linear CKA between two [B, D] feature batches (loss.py:34-77).

    For a linear kernel, double-centering the gram matrix (HKH) equals
    centering the features by their row mean, so with a ``sample_mask``
    we center by the mean over VALID rows and zero the padded rows —
    the trace products then equal the unpadded-submatrix CKA exactly
    (tested). The reference never pads (ragged torch batches), so masked
    rows must not leak into the statistic.
    """
    a = feat_a.astype(jnp.float32)
    b = feat_b.astype(jnp.float32)
    if sample_mask is None:
        n = a.shape[0]
        ac = a - jnp.mean(a, axis=0)
        bc = b - jnp.mean(b, axis=0)
    else:
        w = sample_mask.astype(jnp.float32)[:, None]
        nvalid = jnp.maximum(jnp.sum(w), 1.0)
        ac = (a - jnp.sum(a * w, axis=0) / nvalid) * w
        bc = (b - jnp.sum(b * w, axis=0) / nvalid) * w
    Kc = ac @ ac.T
    Lc = bc @ bc.T
    hsic_kl = jnp.trace(Kc @ Lc)
    hsic_kk = jnp.trace(Kc @ Kc)
    hsic_ll = jnp.trace(Lc @ Lc)
    cka = hsic_kl / (jnp.sqrt(hsic_kk * hsic_ll) + 1e-8)
    return 1.0 - cka


def diff_f1_loss(
    logits: jnp.ndarray, one_hot_targets: jnp.ndarray, epsilon: float = 1e-7
) -> jnp.ndarray:
    """1 - differentiable macro-F1 over sigmoid scores (loss.py:79-119)."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = one_hot_targets.astype(jnp.float32)
    tp = jnp.sum(p * t, axis=0)
    fp = jnp.sum(p * (1.0 - t), axis=0)
    fn = jnp.sum((1.0 - p) * t, axis=0)
    precision = tp / (tp + fp + epsilon)
    recall = tp / (tp + fn + epsilon)
    f1 = 2 * precision * recall / (precision + recall + epsilon)
    return 1.0 - jnp.mean(f1)


def ccc_loss(
    pred: jnp.ndarray, lab: jnp.ndarray, sample_mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Σ_attr (1 - CCC) over arousal/dominance/valence columns.

    Reference: benchmark/utils/loss_manager.py:51-75 computes per-attribute
    CCC with population moments; training minimizes ``3 - ΣCCC``. With a
    sample mask, moments are computed over valid rows only (static-shape
    padded batches).
    """
    pred = pred.astype(jnp.float32)
    lab = lab.astype(jnp.float32)
    if sample_mask is None:
        w = jnp.ones(pred.shape[0], jnp.float32)
    else:
        w = sample_mask.astype(jnp.float32)
    wsum = jnp.maximum(w.sum(), 1e-12)

    def one(p, l):
        m_p = jnp.sum(p * w) / wsum
        m_l = jnp.sum(l * w) / wsum
        d_p, d_l = p - m_p, l - m_l
        cov = jnp.sum(d_p * d_l * w) / wsum
        var_p = jnp.sum(d_p * d_p * w) / wsum
        var_l = jnp.sum(d_l * d_l * w) / wsum
        return 2 * cov / (var_p + var_l + (m_p - m_l) ** 2 + 1e-9)

    total = 0.0
    for i in range(pred.shape[1]):
        total = total + (1.0 - one(pred[:, i], lab[:, i]))
    return total


def mse_emotion(
    pred: jnp.ndarray, lab: jnp.ndarray, sample_mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Σ_attr MSE (reference benchmark/utils/loss_manager.py:77-82)."""
    se = (pred.astype(jnp.float32) - lab.astype(jnp.float32)) ** 2
    if sample_mask is None:
        return jnp.sum(jnp.mean(se, axis=0))
    w = sample_mask.astype(jnp.float32)[:, None]
    return jnp.sum((se * w).sum(axis=0) / jnp.maximum(w.sum(), 1e-12))


# ---------------------------------------------------------------------------
# Speaker-embedding losses (reference: src/information_encoder/losses.py)
# ---------------------------------------------------------------------------


def _cosine_sim(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    a_n = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    b_n = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.sum(a_n * b_n, axis=-1)


def angle_proto_loss(
    embeddings: jnp.ndarray, w: jnp.ndarray = 10.0, b: jnp.ndarray = -5.0
) -> jnp.ndarray:
    """Angular prototypical loss over [n_spk, n_utt, D] embeddings.

    Reference: src/information_encoder/losses.py:122-163 — anchor is the last
    utterance, positive centroid is the mean of the rest; scaled cosine
    similarity matrix with learnable (w, b), CE against speaker identity.
    """
    e = embeddings.astype(jnp.float32)
    anchor = e[:, -1, :]  # [S, D]
    centroid = jnp.mean(e[:, :-1, :], axis=1)  # [S, D]
    a_n = anchor / jnp.maximum(jnp.linalg.norm(anchor, axis=-1, keepdims=True), 1e-8)
    c_n = centroid / jnp.maximum(jnp.linalg.norm(centroid, axis=-1, keepdims=True), 1e-8)
    cos = a_n @ c_n.T  # [S, S]
    w = jnp.clip(w, 1e-6, None)
    scores = cos * w + b
    labels = jnp.arange(scores.shape[0])
    return weighted_cross_entropy(scores, labels)


def ge2e_loss(
    embeddings: jnp.ndarray,
    w: jnp.ndarray = 10.0,
    b: jnp.ndarray = -5.0,
    method: str = "softmax",
) -> jnp.ndarray:
    """GE2E loss over [n_spk, n_utt, D] embeddings (losses.py:7-118).

    For each utterance, similarity to its own speaker's centroid excludes
    that utterance (leave-one-out); cross-speaker centroids use all
    utterances. ``softmax`` method: CE over speakers.
    """
    e = embeddings.astype(jnp.float32)
    S, U, D = e.shape
    e_n = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)
    centroids = jnp.mean(e_n, axis=1)  # [S, D] (normalized-space centroids)
    sum_e = jnp.sum(e_n, axis=1)  # [S, D]
    loo = (sum_e[:, None, :] - e_n) / (U - 1)  # [S, U, D] leave-one-out

    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    cos_all = jnp.einsum("sud,kd->suk", e_n, norm(centroids))  # [S, U, S]
    cos_own = jnp.sum(e_n * norm(loo), axis=-1)  # [S, U]
    own_mask = jax.nn.one_hot(jnp.arange(S), S)[:, None, :]  # [S, 1, S]
    cos = cos_all * (1 - own_mask) + cos_own[:, :, None] * own_mask
    w = jnp.clip(w, 1e-6, None)
    scores = cos * w + b  # [S, U, S]
    own_idx = jnp.broadcast_to(jnp.arange(S)[:, None, None], (S, U, 1))
    if method == "softmax":
        logp = jax.nn.log_softmax(scores, axis=-1)
        own = jnp.take_along_axis(logp, own_idx, axis=-1)
        return -jnp.mean(own)
    # contrast: 1 - sigmoid(own-centroid score) + max over other speakers
    sig = jax.nn.sigmoid(scores)
    own = jnp.take_along_axis(sig, own_idx, axis=-1)[..., 0]  # [S, U]
    others_max = jnp.max(
        jnp.where(jnp.broadcast_to(own_mask.astype(bool), sig.shape), -jnp.inf, sig), axis=-1
    )  # [S, U]
    return jnp.mean(1.0 - own + others_max)
