"""Legacy fusion-model variants (the ``bin/old`` capability surface).

- ``MoEEmotionClassifier``: softmax-gated mixture of full fusion experts
  (reference bin/old/train_cat_bimodal_lazy_moe.py:238-358 — experts have
  NO per-modality LayerNorm and 8-head cross attention).
- ``GenderAdversaryHead``: gradient-reversed gender classifier on the
  fused representation (…_grlgender.py:298-354); without reversal it is
  the plain gender aux head (…_gender.py).
- ``SingleModalitySERClassifier``: the wavlm-only lazy classifier
  (…_wavlm_lazy.py:219-278 — input dropout → proj → self-attn residual →
  conv1d → 32x max-pool → mean → MLP).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import TorchMultiheadAttention, attention_pool
from ..ops.grl import gradient_reversal
from ..ops.gru import BiGRU


class _ExpertModule(nn.Module):
    """One MoE expert: fusion classifier sans modality LayerNorms, 8 heads."""

    feat_dims: Sequence[int]
    fusion_hidden_dim: int = 512
    num_emotions: int = 8
    dropout: float = 0.5

    @nn.compact
    def __call__(self, feats, masks=None, deterministic=True):
        H = self.fusion_hidden_dim
        names = ("speech", "text")
        if masks is None:
            masks = [None, None]
        hidden = []
        for name, x, m in zip(names, feats, masks):
            h = nn.Dense(H, name=f"{name}_projection")(x)
            hidden.append(BiGRU(H, name=f"{name}_gru")(h, m))
        finals = []
        for i, name in enumerate(names):
            att = TorchMultiheadAttention(
                2 * H, num_heads=8, dropout=self.dropout, name=f"{name}_attention"
            )
            j = 1 - i
            attended = att(
                hidden[i], hidden[j], hidden[j], key_mask=masks[j],
                deterministic=deterministic,
            )
            finals.append(hidden[i] + attended)
        pooled = []
        for i, name in enumerate(names):
            scores = nn.Dense(1, name=f"{name}_pool_attn")(finals[i])
            pooled.append(attention_pool(finals[i], scores, masks[i]))
        concat = jnp.concatenate(pooled, axis=-1)
        normalized = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(concat)
        h = nn.Dense(H, name="classifier_fc1")(normalized)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.num_emotions, name="classifier_fc2")(h)


class MoEEmotionClassifier(nn.Module):
    """Softmax-gated ensemble of fusion experts."""

    feat_dims: Sequence[int]
    fusion_hidden_dim: int = 512
    num_emotions: int = 8
    num_experts: int = 4
    dropout: float = 0.5

    @nn.compact
    def __call__(self, feats, masks=None, deterministic=True):
        # gate over mean-pooled raw features (masked mean when masks given)
        pooled = []
        for i, x in enumerate(feats):
            if masks is not None and masks[i] is not None:
                m = masks[i][:, :, None]
                pooled.append((x * m).sum(1) / jnp.maximum(m.sum(1), 1.0))
            else:
                pooled.append(x.mean(axis=1))
        gate_in = jnp.concatenate(pooled, axis=-1)
        g = nn.Dense(self.fusion_hidden_dim, name="gate_fc1")(gate_in)
        g = nn.relu(g)
        g = nn.Dropout(self.dropout)(g, deterministic=deterministic)
        gates = jax.nn.softmax(nn.Dense(self.num_experts, name="gate_fc2")(g), axis=-1)

        outs = []
        for e in range(self.num_experts):
            outs.append(
                _ExpertModule(
                    self.feat_dims, self.fusion_hidden_dim, self.num_emotions,
                    self.dropout, name=f"expert{e}",
                )(feats, masks, deterministic)
            )
        expert_outputs = jnp.stack(outs, axis=1)  # [B, E, C]
        return jnp.sum(expert_outputs * gates[:, :, None], axis=1)


class GenderAdversaryHead(nn.Module):
    """GRL (optional) + MLP gender classifier on the fused representation."""

    hidden_dim: int
    use_grl: bool = True
    lambda_reversal: float = 1.0
    dropout: float = 0.5

    @nn.compact
    def __call__(self, fused, deterministic=True):
        h = gradient_reversal(fused, self.lambda_reversal) if self.use_grl else fused
        h = nn.Dense(self.hidden_dim, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(2, name="fc2")(h)


class SingleModalitySERClassifier(nn.Module):
    """wavlm-only lazy classifier (train_cat_wavlm_lazy.py:219-278)."""

    feat_dim: int = 1024
    hidden_dim: int = 512
    num_categories: int = 8
    num_heads: int = 4

    @nn.compact
    def __call__(self, feats, mask=None, deterministic=True):
        h = nn.Dropout(0.5)(feats, deterministic=deterministic)
        h = nn.Dense(self.hidden_dim, name="wav_proj")(h)
        attn = TorchMultiheadAttention(
            self.hidden_dim, self.num_heads, dropout=0.5, name="multihead_attn"
        )(h, h, h, key_mask=mask, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="attn_norm")(attn + h)
        c = nn.Conv(self.hidden_dim, (3,), padding=[(1, 1)], name="conv1d")(h)
        c = nn.LayerNorm(epsilon=1e-5, name="conv_norm")(c)
        # MaxPool1d(kernel=32, stride=32) over time (truncating remainder)
        T = c.shape[1]
        pooled_len = T // 32
        if pooled_len > 0:
            p = c[:, : pooled_len * 32].reshape(c.shape[0], pooled_len, 32, -1).max(axis=2)
        else:
            p = c
        flat = p.mean(axis=1)
        h = nn.Dense(self.hidden_dim, name="classifier_fc1")(flat)
        h = nn.relu(h)
        h = nn.Dropout(0.2)(h, deterministic=deterministic)
        return nn.Dense(self.num_categories, name="classifier_fc2")(h)
