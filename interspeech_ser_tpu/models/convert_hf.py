"""HF checkpoint → flax param converters for the encoder zoo.

Maps transformers state dicts (WavLM / Wav2Vec2 / Hubert / Whisper /
RoBERTa / DeBERTa-v2) onto the TPU-native modules in this package. These
keep the reference's model sourcing intact: the extraction CLIs accept the
same HF model names/paths (reference: preprocessing/preprocess_speech.py:111-112)
and convert on load.

Conventions: torch Linear [out,in] → flax Dense kernel [in,out] (transpose);
torch Conv1d [out,in/g,k] → flax Conv kernel [k,in/g,out]; weight-normed
convs are folded (g·v/‖v‖) into plain kernels — exact at inference, and the
parametrization only affects from-scratch training dynamics.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w).T


def _conv(w) -> np.ndarray:  # [out, in/g, k] -> [k, in/g, out]
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def _fold_weight_norm(sd: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    """Fold torch weight_norm(dim=2) conv params into a plain kernel."""
    for g_name, v_name in (
        (f"{prefix}.parametrizations.weight.original0", f"{prefix}.parametrizations.weight.original1"),
        (f"{prefix}.weight_g", f"{prefix}.weight_v"),
    ):
        if g_name in sd:
            g = np.asarray(sd[g_name])  # [1, 1, k]
            v = np.asarray(sd[v_name])  # [out, in/g, k]
            norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
            return v * (g / np.maximum(norm, 1e-12))
    return np.asarray(sd[f"{prefix}.weight"])  # already folded


def _put(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


def speech_hf_to_flax(sd: Dict[str, np.ndarray], config) -> Dict:
    """WavLM / Wav2Vec2 / Hubert state dict → SpeechEncoderModel params.

    Accepts dicts from ``model.state_dict()`` of the bare HF models
    (no ``wavlm.``/``wav2vec2.``/``hubert.`` prefix).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: Dict = {}

    # conv frontend
    for i in range(len(config.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        _put(p, ("feature_extractor", f"conv{i}", "kernel"), _conv(sd[f"{base}.conv.weight"]))
        if f"{base}.conv.bias" in sd:
            _put(p, ("feature_extractor", f"conv{i}", "bias"), sd[f"{base}.conv.bias"])
        if config.feat_extract_norm == "layer":
            _put(p, ("feature_extractor", f"conv_ln{i}", "scale"), sd[f"{base}.layer_norm.weight"])
            _put(p, ("feature_extractor", f"conv_ln{i}", "bias"), sd[f"{base}.layer_norm.bias"])
        elif i == 0:  # group mode: GroupNorm on layer 0 (named layer_norm in HF)
            _put(p, ("feature_extractor", "group_norm", "scale"), sd[f"{base}.layer_norm.weight"])
            _put(p, ("feature_extractor", "group_norm", "bias"), sd[f"{base}.layer_norm.bias"])

    # feature projection
    _put(p, ("fp_layer_norm", "scale"), sd["feature_projection.layer_norm.weight"])
    _put(p, ("fp_layer_norm", "bias"), sd["feature_projection.layer_norm.bias"])
    _put(p, ("fp_projection", "kernel"), _t(sd["feature_projection.projection.weight"]))
    _put(p, ("fp_projection", "bias"), sd["feature_projection.projection.bias"])

    # positional conv (weight-norm folded)
    _put(
        p, ("pos_conv_embed", "conv", "kernel"),
        _conv(_fold_weight_norm(sd, "encoder.pos_conv_embed.conv")),
    )
    _put(p, ("pos_conv_embed", "conv", "bias"), sd["encoder.pos_conv_embed.conv.bias"])

    _put(p, ("encoder_layer_norm", "scale"), sd["encoder.layer_norm.weight"])
    _put(p, ("encoder_layer_norm", "bias"), sd["encoder.layer_norm.bias"])

    for i in range(config.num_layers):
        base = f"encoder.layers.{i}"
        dst = f"layer{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _put(p, (dst, "attention", proj, "kernel"), _t(sd[f"{base}.attention.{proj}.weight"]))
            _put(p, (dst, "attention", proj, "bias"), sd[f"{base}.attention.{proj}.bias"])
        if config.attention_type == "wavlm":
            _put(
                p, (dst, "attention", "gru_rel_pos_linear", "kernel"),
                _t(sd[f"{base}.attention.gru_rel_pos_linear.weight"]),
            )
            _put(
                p, (dst, "attention", "gru_rel_pos_linear", "bias"),
                sd[f"{base}.attention.gru_rel_pos_linear.bias"],
            )
            _put(
                p, (dst, "attention", "gru_rel_pos_const"),
                sd[f"{base}.attention.gru_rel_pos_const"],
            )
            if i == 0:
                _put(
                    p, (dst, "attention", "rel_attn_embed"),
                    sd[f"{base}.attention.rel_attn_embed.weight"],
                )
        _put(p, (dst, "layer_norm", "scale"), sd[f"{base}.layer_norm.weight"])
        _put(p, (dst, "layer_norm", "bias"), sd[f"{base}.layer_norm.bias"])
        _put(p, (dst, "final_layer_norm", "scale"), sd[f"{base}.final_layer_norm.weight"])
        _put(p, (dst, "final_layer_norm", "bias"), sd[f"{base}.final_layer_norm.bias"])
        _put(
            p, (dst, "feed_forward", "intermediate_dense", "kernel"),
            _t(sd[f"{base}.feed_forward.intermediate_dense.weight"]),
        )
        _put(
            p, (dst, "feed_forward", "intermediate_dense", "bias"),
            sd[f"{base}.feed_forward.intermediate_dense.bias"],
        )
        _put(
            p, (dst, "feed_forward", "output_dense", "kernel"),
            _t(sd[f"{base}.feed_forward.output_dense.weight"]),
        )
        _put(
            p, (dst, "feed_forward", "output_dense", "bias"),
            sd[f"{base}.feed_forward.output_dense.bias"],
        )
    return p
