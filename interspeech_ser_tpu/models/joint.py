"""Joint roberta+wavlm fine-tune heads (the bin/old `train_cat_roberta*` family).

Reference scripts (all in /root/reference/bin/old/):

- ``train_cat_roberta_wavlm.py:217-273`` — ``MultimodalSERClassifier``:
  per-modality Conv1d(k3,p1)->ReLU->Dropout->Conv1d->ReLU -> adaptive max
  pool -> concat -> [Linear, LayerNorm, ReLU, Dropout(.2), Linear] head.
  Input dropout(.5) on both encoder outputs.
- ``train_cat_roberta_wavlm_ftall.py:223-266`` — same conv head but
  dropout .2, no input dropout, no LayerNorm in the classifier.
- ``train_cat_roberta_wavlm_large.py:258-325`` — transformer head:
  Dropout(.5) -> Linear proj -> 2-layer 1-head post-LN torch
  TransformerEncoder (ffn 4h, dropout .5, relu) -> mean pool -> concat ->
  [Linear, ReLU, Dropout(.2), Linear].
- ``train_cat_roberta_wavlm_large_cka.py:293-342`` — adds per-modality
  sigmoid gates ("FIONA" gating) and returns the gated features for the
  CKA coupling loss.

The reference trains on padded batches WITHOUT masks (max/mean pooling and
transformer attention see padding) and evaluates at batch size 1; with
``masked=True`` (default) pooling/attention exclude padding so a batched
run equals the reference's batch-1 eval exactly. ``masked=False``
reproduces the reference's unmasked batched-training semantics.

Converters emit/load the reference's exact torch ``state_dict`` names so
``final_ser.pt`` round-trips with the original scripts.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import NEG_INF, TorchMultiheadAttention


class TorchTransformerEncoderLayer(nn.Module):
    """torch ``nn.TransformerEncoderLayer`` (post-LN, relu, batch_first)."""

    d_model: int
    nhead: int = 1
    dim_feedforward: int = 2048
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        key_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        attn = TorchMultiheadAttention(
            self.d_model, self.nhead, dropout=self.dropout, name="self_attn"
        )
        h = attn(x, x, x, key_mask=key_mask, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + h)
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


def _masked_max_pool(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """AdaptiveMaxPool1d(1) over time; padding excluded when mask given.

    Fully-masked rows (static-shape batch padding on a mesh) pool to 0
    rather than NEG_INF: -1e30 overflows f32 to inf/NaN in the next
    dense/LayerNorm and poisons shared-parameter gradients of the whole
    batch. ``where`` keeps both forward and backward exactly zero there.
    """
    if mask is None:
        return jnp.max(x, axis=1)
    pooled = jnp.max(jnp.where(mask[:, :, None].astype(bool), x, NEG_INF), axis=1)
    valid = jnp.any(mask.astype(bool), axis=1)[:, None]
    return jnp.where(valid, pooled, 0.0)


def _masked_mean_pool(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x, axis=1)
    m = mask[:, :, None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)


class ConvJointHead(nn.Module):
    """Reference ``MultimodalSERClassifier`` (conv variant).

    ``legacy_layernorm``/``input_dropout``/dropout .5 = the frozen-encoder
    script; ftall uses dropout .2, no input dropout, no LayerNorm.
    """

    wav_dim: int
    txt_dim: int
    hidden_dim: int = 512
    num_categories: int = 8
    dropout: float = 0.5
    input_dropout: bool = True
    classifier_layernorm: bool = True
    masked: bool = True

    @nn.compact
    def __call__(
        self,
        wav_feats: jnp.ndarray,  # [B, Tw, Dw]
        txt_feats: jnp.ndarray,  # [B, Tt, Dt]
        wav_mask: Optional[jnp.ndarray] = None,
        txt_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)
        wav_mask = wav_mask if self.masked else None
        txt_mask = txt_mask if self.masked else None

        def branch(x, mask, prefix):
            if self.input_dropout:
                x = drop(x)
            if mask is not None:
                # encoder outputs are nonzero at pad frames; zero them so
                # conv1's boundary matches a batch-1 unpadded forward
                x = x * mask[:, :, None].astype(x.dtype)
            x = nn.Conv(self.hidden_dim, (3,), padding=[(1, 1)], name=f"{prefix}_conv1")(x)
            x = drop(nn.relu(x))
            if mask is not None:
                # zero pad frames so conv2's boundary sees exactly the
                # zero padding a batch-1 unpadded forward would (parity with
                # the reference's batch-1 eval)
                x = x * mask[:, :, None].astype(x.dtype)
            x = nn.Conv(self.hidden_dim, (3,), padding=[(1, 1)], name=f"{prefix}_conv2")(x)
            return _masked_max_pool(nn.relu(x), mask)

        wav_x = branch(wav_feats, wav_mask, "wav")
        rob_x = branch(txt_feats, txt_mask, "rob")
        h = jnp.concatenate([wav_x, rob_x], axis=1)
        h = nn.Dense(self.hidden_dim, name="cls_dense")(h)
        if self.classifier_layernorm:
            h = nn.LayerNorm(epsilon=1e-5, name="cls_norm")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.2)(h, deterministic=deterministic)
        return nn.Dense(self.num_categories, name="cls_out")(h)


class TransformerJointHead(nn.Module):
    """Reference ``MultimodalSERClassifier`` (transformer variant, ±gates).

    Returns logits, or ``(logits, wav_x, rob_x)`` when ``gated`` (the CKA
    scripts couple the gated pooled features).
    """

    wav_dim: int
    txt_dim: int
    hidden_dim: int = 512
    num_categories: int = 8
    num_layers: int = 2
    gated: bool = False
    masked: bool = True

    @nn.compact
    def __call__(
        self,
        wav_feats: jnp.ndarray,
        txt_feats: jnp.ndarray,
        wav_mask: Optional[jnp.ndarray] = None,
        txt_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        wav_mask = wav_mask if self.masked else None
        txt_mask = txt_mask if self.masked else None

        def branch(x, mask, prefix):
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
            x = nn.Dense(self.hidden_dim, name=f"{prefix}_proj")(x)
            for i in range(self.num_layers):
                x = TorchTransformerEncoderLayer(
                    self.hidden_dim, nhead=1, dim_feedforward=self.hidden_dim * 4,
                    dropout=0.5, name=f"{prefix}_transformer_{i}",
                )(x, key_mask=mask, deterministic=deterministic)
            return _masked_mean_pool(x, mask)

        wav_x = branch(wav_feats, wav_mask, "wav")
        rob_x = branch(txt_feats, txt_mask, "rob")
        if self.gated:
            wav_x = wav_x * nn.sigmoid(nn.Dense(self.hidden_dim, name="wav_gate")(wav_x))
            rob_x = rob_x * nn.sigmoid(nn.Dense(self.hidden_dim, name="rob_gate")(rob_x))
        h = jnp.concatenate([wav_x, rob_x], axis=1)
        h = nn.Dense(self.hidden_dim, name="cls_dense")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.2)(h, deterministic=deterministic)
        logits = nn.Dense(self.num_categories, name="cls_out")(h)
        if self.gated:
            return logits, wav_x, rob_x
        return logits


class RobertaClassificationHead(nn.Module):
    """HF ``RobertaClassificationHead`` (<s> token -> dense -> tanh -> out).

    Used by the text-only trainer (reference bin/old/train_cat_roberta.py
    loads ``RobertaForSequenceClassification``).
    """

    hidden_size: int
    num_labels: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = hidden[:, 0, :]
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = jnp.tanh(nn.Dense(self.hidden_size, name="dense")(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.num_labels, name="out_proj")(x)


# ---------------------------------------------------------------------------
# torch state_dict converters (reference save format: final_ser.pt)
# ---------------------------------------------------------------------------


def _conv_to_torch(p):  # flax [k, cin, cout] -> torch [cout, cin, k]
    return np.asarray(p).transpose(2, 1, 0)


def _conv_to_flax(w):  # torch [cout, cin, k] -> flax [k, cin, cout]
    return np.asarray(w).transpose(2, 1, 0)


def conv_joint_flax_to_torch(params, classifier_layernorm: bool = True) -> dict:
    """ConvJointHead -> reference MultimodalSERClassifier state_dict names."""
    sd = {}
    for flax_name, torch_name in (
        ("wav_conv1", "wav_conv1"), ("wav_conv2", "wav_conv2"),
        ("rob_conv1", "rob_conv1"), ("rob_conv2", "rob_conv2"),
    ):
        sd[f"{torch_name}.weight"] = _conv_to_torch(params[flax_name]["kernel"])
        sd[f"{torch_name}.bias"] = np.asarray(params[flax_name]["bias"])
    sd["classifier.0.weight"] = np.asarray(params["cls_dense"]["kernel"]).T
    sd["classifier.0.bias"] = np.asarray(params["cls_dense"]["bias"])
    if classifier_layernorm:  # Sequential: Linear, LayerNorm, ReLU, Dropout, Linear
        sd["classifier.1.weight"] = np.asarray(params["cls_norm"]["scale"])
        sd["classifier.1.bias"] = np.asarray(params["cls_norm"]["bias"])
        out_idx = 4
    else:  # Sequential: Linear, ReLU, Dropout, Linear
        out_idx = 3
    sd[f"classifier.{out_idx}.weight"] = np.asarray(params["cls_out"]["kernel"]).T
    sd[f"classifier.{out_idx}.bias"] = np.asarray(params["cls_out"]["bias"])
    return sd


def conv_joint_torch_to_flax(sd, classifier_layernorm: bool = True) -> dict:
    params = {}
    for name in ("wav_conv1", "wav_conv2", "rob_conv1", "rob_conv2"):
        params[name] = {
            "kernel": _conv_to_flax(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"]),
        }
    params["cls_dense"] = {
        "kernel": np.asarray(sd["classifier.0.weight"]).T,
        "bias": np.asarray(sd["classifier.0.bias"]),
    }
    out_idx = 4 if classifier_layernorm else 3
    if classifier_layernorm:
        params["cls_norm"] = {
            "scale": np.asarray(sd["classifier.1.weight"]),
            "bias": np.asarray(sd["classifier.1.bias"]),
        }
    params["cls_out"] = {
        "kernel": np.asarray(sd[f"classifier.{out_idx}.weight"]).T,
        "bias": np.asarray(sd[f"classifier.{out_idx}.bias"]),
    }
    return params


def _tel_flax_to_torch(p, prefix):
    """TorchTransformerEncoderLayer params -> torch layer names."""
    return {
        f"{prefix}.self_attn.in_proj_weight": np.asarray(p["self_attn"]["in_proj_kernel"]).T,
        f"{prefix}.self_attn.in_proj_bias": np.asarray(p["self_attn"]["in_proj_bias"]),
        f"{prefix}.self_attn.out_proj.weight": np.asarray(p["self_attn"]["out_kernel"]).T,
        f"{prefix}.self_attn.out_proj.bias": np.asarray(p["self_attn"]["out_bias"]),
        f"{prefix}.linear1.weight": np.asarray(p["linear1"]["kernel"]).T,
        f"{prefix}.linear1.bias": np.asarray(p["linear1"]["bias"]),
        f"{prefix}.linear2.weight": np.asarray(p["linear2"]["kernel"]).T,
        f"{prefix}.linear2.bias": np.asarray(p["linear2"]["bias"]),
        f"{prefix}.norm1.weight": np.asarray(p["norm1"]["scale"]),
        f"{prefix}.norm1.bias": np.asarray(p["norm1"]["bias"]),
        f"{prefix}.norm2.weight": np.asarray(p["norm2"]["scale"]),
        f"{prefix}.norm2.bias": np.asarray(p["norm2"]["bias"]),
    }


def _tel_torch_to_flax(sd, prefix):
    return {
        "self_attn": {
            "in_proj_kernel": np.asarray(sd[f"{prefix}.self_attn.in_proj_weight"]).T,
            "in_proj_bias": np.asarray(sd[f"{prefix}.self_attn.in_proj_bias"]),
            "out_kernel": np.asarray(sd[f"{prefix}.self_attn.out_proj.weight"]).T,
            "out_bias": np.asarray(sd[f"{prefix}.self_attn.out_proj.bias"]),
        },
        "linear1": {
            "kernel": np.asarray(sd[f"{prefix}.linear1.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}.linear1.bias"]),
        },
        "linear2": {
            "kernel": np.asarray(sd[f"{prefix}.linear2.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}.linear2.bias"]),
        },
        "norm1": {
            "scale": np.asarray(sd[f"{prefix}.norm1.weight"]),
            "bias": np.asarray(sd[f"{prefix}.norm1.bias"]),
        },
        "norm2": {
            "scale": np.asarray(sd[f"{prefix}.norm2.weight"]),
            "bias": np.asarray(sd[f"{prefix}.norm2.bias"]),
        },
    }


def transformer_joint_flax_to_torch(params, num_layers: int = 2, gated: bool = False) -> dict:
    sd = {}
    for prefix in ("wav", "rob"):
        sd[f"{prefix}_proj.weight"] = np.asarray(params[f"{prefix}_proj"]["kernel"]).T
        sd[f"{prefix}_proj.bias"] = np.asarray(params[f"{prefix}_proj"]["bias"])
        for i in range(num_layers):
            sd.update(
                _tel_flax_to_torch(
                    params[f"{prefix}_transformer_{i}"],
                    f"{prefix}_transformer.layers.{i}",
                )
            )
        if gated:
            sd[f"{prefix}_gate.0.weight"] = np.asarray(params[f"{prefix}_gate"]["kernel"]).T
            sd[f"{prefix}_gate.0.bias"] = np.asarray(params[f"{prefix}_gate"]["bias"])
    sd["classifier.0.weight"] = np.asarray(params["cls_dense"]["kernel"]).T
    sd["classifier.0.bias"] = np.asarray(params["cls_dense"]["bias"])
    sd["classifier.3.weight"] = np.asarray(params["cls_out"]["kernel"]).T
    sd["classifier.3.bias"] = np.asarray(params["cls_out"]["bias"])
    return sd


def transformer_joint_torch_to_flax(sd, num_layers: int = 2, gated: bool = False) -> dict:
    params = {}
    for prefix in ("wav", "rob"):
        params[f"{prefix}_proj"] = {
            "kernel": np.asarray(sd[f"{prefix}_proj.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}_proj.bias"]),
        }
        for i in range(num_layers):
            params[f"{prefix}_transformer_{i}"] = _tel_torch_to_flax(
                sd, f"{prefix}_transformer.layers.{i}"
            )
        if gated:
            params[f"{prefix}_gate"] = {
                "kernel": np.asarray(sd[f"{prefix}_gate.0.weight"]).T,
                "bias": np.asarray(sd[f"{prefix}_gate.0.bias"]),
            }
    params["cls_dense"] = {
        "kernel": np.asarray(sd["classifier.0.weight"]).T,
        "bias": np.asarray(sd["classifier.0.bias"]),
    }
    params["cls_out"] = {
        "kernel": np.asarray(sd["classifier.3.weight"]).T,
        "bias": np.asarray(sd["classifier.3.bias"]),
    }
    return params
