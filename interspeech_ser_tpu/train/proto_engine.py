"""Angular-prototypical style-embedding trainer.

Capability port of reference bin/old/train_cat_wavlm_lazy_protoangularloss*.py:
class-balanced batches (PerfectBatchSampler over emotion classes), an
embedding network over cached wavlm features, and ``AngleProtoLoss`` on
embeddings grouped [n_classes, n_utter_per_class, D] (optionally +
softmax CE: the SoftmaxAngleProto variant).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import attention_pool
from ..ops.gru import BiGRU
from ..utils.seeding import numpy_generator
from . import losses
from .data import LazyFeatureDataset
from .samplers import PerfectBatchSampler


class StyleEmbeddingNet(nn.Module):
    """proj → BiGRU → attention pooling → embedding (+ optional class head)."""

    feat_dim: int
    hidden_dim: int = 256
    embedding_dim: int = 256
    num_classes: int = 0  # >0 adds the softmax head (SoftmaxAngleProto)

    @nn.compact
    def __call__(self, feats, mask=None):
        h = nn.Dense(self.hidden_dim, name="projection")(feats)
        h = BiGRU(self.hidden_dim, name="gru")(h, mask)
        scores = nn.Dense(1, name="pool_attn")(h)
        pooled = attention_pool(h, scores, mask)
        emb = nn.Dense(self.embedding_dim, name="embedding")(pooled)
        if self.num_classes > 0:
            return emb, nn.Dense(self.num_classes, name="classifier")(emb)
        return emb


class ProtoAngularEngine:
    """Train a style embedder with angular-prototypical batches."""

    def __init__(
        self,
        feat_dim: int,
        num_classes: int = 8,
        utter_per_class: int = 4,
        embedding_dim: int = 256,
        use_softmax_proto: bool = False,
        seed: int = 7,
    ):
        self.model = StyleEmbeddingNet(
            feat_dim, embedding_dim=embedding_dim,
            num_classes=num_classes if use_softmax_proto else 0,
        )
        self.num_classes = num_classes
        self.utter_per_class = utter_per_class
        self.use_softmax_proto = use_softmax_proto
        self.rng = numpy_generator(seed)
        self.key = jax.random.PRNGKey(seed)
        self.params = None
        self._step = None

    def fit(
        self,
        dataset: LazyFeatureDataset,
        class_ids: np.ndarray,
        epochs: int = 5,
        lr: float = 1e-4,
        log=print,
    ):
        import optax

        C, U = self.num_classes, self.utter_per_class
        batch_size = C * U
        feats0 = dataset.collate(list(range(min(2, len(dataset)))), 2)
        if self.params is None:
            self.key, k = jax.random.split(self.key)
            self.params = self.model.init(
                k, jnp.asarray(feats0.feats[0]), jnp.asarray(feats0.masks[0])
            )["params"]
        tx = optax.adamw(lr, weight_decay=1e-6)
        opt_state = tx.init(self.params)
        # learnable (w, b) of the angular-proto scaling (reference losses.py:131-136)
        wb = {"w": jnp.asarray(10.0), "b": jnp.asarray(-5.0)}
        wb_state = optax.adamw(lr).init(wb)

        def step(params, wb, opt_state, wb_state, feats, mask, y):
            def loss_fn(p, wb):
                out = self.model.apply({"params": p}, feats, mask)
                if self.use_softmax_proto:
                    emb, logits = out
                    ce = losses.weighted_cross_entropy(logits, y)
                else:
                    emb, ce = out, 0.0
                grouped = emb.reshape(C, U, -1)
                ap = losses.angle_proto_loss(grouped, wb["w"], wb["b"])
                return ap + ce, ap

            (total, ap), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, wb
            )
            updates, opt_state = tx.update(grads[0], opt_state, params)
            params = optax.apply_updates(params, updates)
            wb_updates, wb_state = optax.adamw(lr).update(grads[1], wb_state, wb)
            wb = optax.apply_updates(wb, wb_updates)
            return params, wb, opt_state, wb_state, total, ap

        step_jit: Dict = {}
        for epoch in range(epochs):
            sampler = PerfectBatchSampler(
                class_ids, range(C), batch_size, shuffle=True, drop_last=True,
                seed=int(self.rng.integers(0, 2 ** 31)),
            )
            last = None
            for idxs in sampler:
                batch = dataset.collate(list(idxs), batch_size)
                y = jnp.asarray(np.argmax(batch.labels, axis=1))
                sig = batch.feats[0].shape
                if sig not in step_jit:
                    step_jit[sig] = jax.jit(step, donate_argnums=(0, 1, 2, 3))
                self.params, wb, opt_state, wb_state, total, ap = step_jit[sig](
                    self.params, wb, opt_state, wb_state,
                    jnp.asarray(batch.feats[0]), jnp.asarray(batch.masks[0]), y,
                )
                last = (float(total), float(ap))
            if last:
                log(f"epoch {epoch}: loss={last[0]:.4f} angle_proto={last[1]:.4f}")
        return self.params

    def embed(self, dataset: LazyFeatureDataset, batch_size: int = 16) -> np.ndarray:
        out = []
        fwd: Dict = {}
        for s in range(0, len(dataset), batch_size):
            idxs = list(range(s, min(s + batch_size, len(dataset))))
            b = dataset.collate(idxs, batch_size)
            sig = b.feats[0].shape
            if sig not in fwd:
                fwd[sig] = jax.jit(
                    lambda p, f, m: self.model.apply({"params": p}, f, m)
                )
            o = fwd[sig](self.params, jnp.asarray(b.feats[0]), jnp.asarray(b.masks[0]))
            emb = o[0] if self.use_softmax_proto else o
            out.append(np.asarray(emb)[: len(idxs)])
        return np.concatenate(out)
