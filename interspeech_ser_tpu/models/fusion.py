"""Lazy-fusion emotion classifiers (bimodal / trimodal / ranking head).

TPU-native port of the reference's core trainable architecture
(reference: bin/train_cat_bimodal_lazy_1head.py:236-334 bimodal,
bin/train_cat_trimodal_lazy_1head.py:247-366 trimodal,
bin/train_cat_bimodal_lazy_1head_ranking.py:283-288 neutral head):

per modality  Linear(feat_dim→H) → LayerNorm → bidirectional GRU(H→2H)
→ pairwise cross-modal MultiheadAttention (residual) → softmax attention
pooling → concat → LayerNorm → MLP(→H→ReLU→Dropout→num_emotions logits)
[+ parallel 1-logit neutral head for the ranking variants].

Key departures from the reference, both TPU-motivated:
- static shapes: inputs are padded to bucket lengths and accompanied by
  per-frame masks; GRU / attention / pooling all honor the mask, so a
  padded batched forward equals the reference's unpadded batch-1 forward
  (see ops/gru.py and ops/attention.py docstrings). ``masked=False``
  replicates the reference's unmasked padded-batch training semantics.
- one shared module instead of 13 copy-pasted per-script model classes.

Trimodal quirk preserved: ``prosody_features.squeeze(-1)`` (reference
train_cat_trimodal_lazy_1head.py:327) is a no-op for [B, T, D] inputs and is
handled by the caller feeding 3-D features; the shared speech/text attention
modules are each applied twice with tied weights exactly as in the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import TorchMultiheadAttention, attention_pool
from ..ops.gru import BiGRU

MODALITY_NAMES = ("speech", "text", "prosody")


class _ModalityEncoder(nn.Module):
    """Linear projection → LayerNorm → BiGRU for one modality.

    ``use_norm=False`` drops the post-projection LayerNorm (the gender_svm
    legacy model removes it — bin/old/train_cat_bimodal_lazy_gender_svm.py).
    """

    fusion_hidden_dim: int
    param_dtype: jnp.dtype = jnp.float32
    use_norm: bool = True

    @nn.compact
    def __call__(
        self, feats: jnp.ndarray, mask: Optional[jnp.ndarray], use_gru_kernel: bool = False
    ) -> jnp.ndarray:
        h = nn.Dense(self.fusion_hidden_dim, param_dtype=self.param_dtype, name="projection")(feats)
        if self.use_norm:
            h = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype, name="norm")(h)
        return BiGRU(self.fusion_hidden_dim, param_dtype=self.param_dtype, name="gru")(
            h, mask, use_kernel=use_gru_kernel
        )


class MultiModalEmotionClassifier(nn.Module):
    """Bimodal or trimodal fusion classifier.

    Args:
        feat_dims: per-modality input feature dims (len 2 or 3).
        fusion_hidden_dim: H (512 in all reference configs).
        num_emotions: 8.
        dropout: classifier + attention dropout (0.5).
        neutral_head: add the ranking variants' 1-logit neutral classifier.
        masked: honor padding masks (False = reference unmasked semantics).
    """

    feat_dims: Sequence[int]
    fusion_hidden_dim: int = 512
    num_emotions: int = 8
    dropout: float = 0.5
    neutral_head: bool = False
    # 'grl' = adversarial gender head (…_grlgender.py), 'aux' = plain aux
    # head (…_gender.py); adds a second output alongside the logits
    gender_head: Optional[str] = None
    # None = reference head counts (1; 2 for trimodal prosody); the pre-
    # 1head legacy scripts used more heads (bin/old/train_cat_bimodal_lazy.py)
    attention_heads: Optional[int] = None
    masked: bool = True
    # fiona variant: sigmoid gates on the pooled representations before
    # concat (bin/old/train_cat_bimodal_lazy_fiona.py:276-339); the gated
    # values are also what its CKA loss couples
    gated_pool: bool = False
    # gender_svm variant drops the post-projection LayerNorms
    modality_norm: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: Sequence[jnp.ndarray],  # list of [B, T_m, D_m]
        masks: Optional[Sequence[jnp.ndarray]] = None,  # list of [B, T_m]
        deterministic: bool = True,
        output_dict: bool = False,
        use_gru_kernel: bool = False,  # fused Pallas GRU (inference path)
    ):
        n_mod = len(self.feat_dims)
        assert len(feats) == n_mod and n_mod in (2, 3)
        if masks is None or not self.masked:
            masks = [None] * n_mod

        H = self.fusion_hidden_dim
        names = MODALITY_NAMES[:n_mod]

        hidden = []
        for name, x, m in zip(names, feats, masks):
            hidden.append(
                _ModalityEncoder(
                    H, self.param_dtype, use_norm=self.modality_norm,
                    name=f"{name}_encoder",
                )(x, m, use_gru_kernel)
            )

        # Cross-modal attention: module per query modality, applied (with tied
        # weights) to every other modality; residual sum of all attended views.
        attn_mods = []
        for i, name in enumerate(names):
            heads = self.attention_heads or (
                2 if (n_mod == 3 and name == "prosody") else 1
            )
            attn_mods.append(
                TorchMultiheadAttention(
                    2 * H,
                    num_heads=heads,
                    dropout=self.dropout,
                    param_dtype=self.param_dtype,
                    name=f"{name}_attention",
                )
            )

        finals = []
        for i in range(n_mod):
            total = hidden[i]
            for j in range(n_mod):
                if j == i:
                    continue
                total = total + attn_mods[i](
                    hidden[i], hidden[j], hidden[j],
                    key_mask=masks[j], deterministic=deterministic,
                )
            finals.append(total)

        pooled = []
        for i, name in enumerate(names):
            scores = nn.Dense(1, param_dtype=self.param_dtype, name=f"{name}_pool_attn")(
                finals[i]
            )
            pooled.append(attention_pool(finals[i], scores, masks[i]))

        if self.gated_pool:
            pooled = [
                p * nn.sigmoid(
                    nn.Dense(2 * H, param_dtype=self.param_dtype, name=f"{name}_gate")(p)
                )
                for name, p in zip(names, pooled)
            ]

        concatenated = jnp.concatenate(pooled, axis=-1)  # [B, 2H * n_mod]
        normalized = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype, name="fusion_norm")(
            concatenated
        )

        def head(prefix: str, out_dim: int) -> jnp.ndarray:
            h = nn.Dense(H, param_dtype=self.param_dtype, name=f"{prefix}_fc1")(normalized)
            h = nn.relu(h)
            h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
            return nn.Dense(out_dim, param_dtype=self.param_dtype, name=f"{prefix}_fc2")(h)

        logits = head("classifier", self.num_emotions)
        neutral = head("neutral", 1) if self.neutral_head else None
        gender = None
        if self.gender_head is not None:
            from .fusion_variants import GenderAdversaryHead

            gender = GenderAdversaryHead(
                H, use_grl=(self.gender_head == "grl"), dropout=self.dropout,
                name="gender_classifier",
            )(normalized, deterministic=deterministic)

        if output_dict:
            return {
                "logits": logits,
                "neutral": neutral,
                "gender": gender,
                "pooled": pooled,
                "fused": normalized,
            }
        if self.neutral_head and gender is not None:
            return logits, neutral, gender
        if self.neutral_head:
            return logits, neutral
        if gender is not None:
            return logits, gender
        return logits
