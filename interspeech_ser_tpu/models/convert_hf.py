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


def whisper_encoder_hf_to_flax(sd: Dict[str, np.ndarray], config) -> Dict:
    """HF WhisperEncoder state dict → WhisperEncoderModel params.

    Accepts dicts from ``WhisperModel.encoder.state_dict()`` (keys like
    ``conv1.weight``) or full-model dicts with ``model.encoder.`` /
    ``encoder.`` prefixes (stripped here).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    for prefix in ("model.encoder.", "encoder."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            break

    p: Dict = {}
    _put(p, ("conv1", "kernel"), _conv(sd["conv1.weight"]))
    _put(p, ("conv1", "bias"), sd["conv1.bias"])
    _put(p, ("conv2", "kernel"), _conv(sd["conv2.weight"]))
    _put(p, ("conv2", "bias"), sd["conv2.bias"])
    _put(p, ("embed_positions",), sd["embed_positions.weight"])
    _put(p, ("layer_norm", "scale"), sd["layer_norm.weight"])
    _put(p, ("layer_norm", "bias"), sd["layer_norm.bias"])
    for i in range(config.encoder_layers):
        base = f"layers.{i}"
        dst = f"layer{i}"
        for proj in ("q_proj", "v_proj", "out_proj"):
            _put(p, (dst, "self_attn", proj, "kernel"), _t(sd[f"{base}.self_attn.{proj}.weight"]))
            _put(p, (dst, "self_attn", proj, "bias"), sd[f"{base}.self_attn.{proj}.bias"])
        _put(p, (dst, "self_attn", "k_proj", "kernel"), _t(sd[f"{base}.self_attn.k_proj.weight"]))
        _put(p, (dst, "self_attn_layer_norm", "scale"), sd[f"{base}.self_attn_layer_norm.weight"])
        _put(p, (dst, "self_attn_layer_norm", "bias"), sd[f"{base}.self_attn_layer_norm.bias"])
        _put(p, (dst, "final_layer_norm", "scale"), sd[f"{base}.final_layer_norm.weight"])
        _put(p, (dst, "final_layer_norm", "bias"), sd[f"{base}.final_layer_norm.bias"])
        _put(p, (dst, "fc1", "kernel"), _t(sd[f"{base}.fc1.weight"]))
        _put(p, (dst, "fc1", "bias"), sd[f"{base}.fc1.bias"])
        _put(p, (dst, "fc2", "kernel"), _t(sd[f"{base}.fc2.weight"]))
        _put(p, (dst, "fc2", "bias"), sd[f"{base}.fc2.bias"])
    return p


def roberta_hf_to_flax(sd: Dict[str, np.ndarray], config) -> Dict:
    """HF RobertaModel state dict → RobertaModel (flax) params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if any(k.startswith("roberta.") for k in sd):
        sd = {k[len("roberta."):]: v for k, v in sd.items() if k.startswith("roberta.")}
    p: Dict = {}
    _put(p, ("word_embeddings",), sd["embeddings.word_embeddings.weight"])
    _put(p, ("position_embeddings",), sd["embeddings.position_embeddings.weight"])
    _put(p, ("token_type_embeddings",), sd["embeddings.token_type_embeddings.weight"])
    _put(p, ("emb_layer_norm", "scale"), sd["embeddings.LayerNorm.weight"])
    _put(p, ("emb_layer_norm", "bias"), sd["embeddings.LayerNorm.bias"])
    for i in range(config.num_layers):
        base = f"encoder.layer.{i}"
        dst = f"layer{i}"
        for src, name in (("query", "query"), ("key", "key"), ("value", "value")):
            _put(p, (dst, "self", name, "kernel"), _t(sd[f"{base}.attention.self.{src}.weight"]))
            _put(p, (dst, "self", name, "bias"), sd[f"{base}.attention.self.{src}.bias"])
        _put(p, (dst, "attn_output", "kernel"), _t(sd[f"{base}.attention.output.dense.weight"]))
        _put(p, (dst, "attn_output", "bias"), sd[f"{base}.attention.output.dense.bias"])
        _put(p, (dst, "attn_layer_norm", "scale"), sd[f"{base}.attention.output.LayerNorm.weight"])
        _put(p, (dst, "attn_layer_norm", "bias"), sd[f"{base}.attention.output.LayerNorm.bias"])
        _put(p, (dst, "intermediate", "kernel"), _t(sd[f"{base}.intermediate.dense.weight"]))
        _put(p, (dst, "intermediate", "bias"), sd[f"{base}.intermediate.dense.bias"])
        _put(p, (dst, "output", "kernel"), _t(sd[f"{base}.output.dense.weight"]))
        _put(p, (dst, "output", "bias"), sd[f"{base}.output.dense.bias"])
        _put(p, (dst, "output_layer_norm", "scale"), sd[f"{base}.output.LayerNorm.weight"])
        _put(p, (dst, "output_layer_norm", "bias"), sd[f"{base}.output.LayerNorm.bias"])
    return p


def deberta_v2_hf_to_flax(sd: Dict[str, np.ndarray], config) -> Dict:
    """HF DebertaV2Model state dict → DebertaV2Model (flax) params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if any(k.startswith("deberta.") for k in sd):
        sd = {k[len("deberta."):]: v for k, v in sd.items() if k.startswith("deberta.")}
    p: Dict = {}
    _put(p, ("word_embeddings",), sd["embeddings.word_embeddings.weight"])
    if config.position_biased_input:
        _put(p, ("position_embeddings",), sd["embeddings.position_embeddings.weight"])
    _put(p, ("emb_layer_norm", "scale"), sd["embeddings.LayerNorm.weight"])
    _put(p, ("emb_layer_norm", "bias"), sd["embeddings.LayerNorm.bias"])
    _put(p, ("rel_embeddings",), sd["encoder.rel_embeddings.weight"])
    _put(p, ("rel_emb_layer_norm", "scale"), sd["encoder.LayerNorm.weight"])
    _put(p, ("rel_emb_layer_norm", "bias"), sd["encoder.LayerNorm.bias"])
    if config.conv_kernel_size > 0:
        _put(p, ("conv", "kernel"), _conv(sd["encoder.conv.conv.weight"]))
        _put(p, ("conv", "bias"), sd["encoder.conv.conv.bias"])
        _put(p, ("conv_layer_norm", "scale"), sd["encoder.conv.LayerNorm.weight"])
        _put(p, ("conv_layer_norm", "bias"), sd["encoder.conv.LayerNorm.bias"])
    for i in range(config.num_layers):
        base = f"encoder.layer.{i}"
        dst = f"layer{i}"
        for proj in ("query_proj", "key_proj", "value_proj"):
            _put(p, (dst, "self", proj, "kernel"), _t(sd[f"{base}.attention.self.{proj}.weight"]))
            _put(p, (dst, "self", proj, "bias"), sd[f"{base}.attention.self.{proj}.bias"])
        _put(p, (dst, "attn_output", "kernel"), _t(sd[f"{base}.attention.output.dense.weight"]))
        _put(p, (dst, "attn_output", "bias"), sd[f"{base}.attention.output.dense.bias"])
        _put(p, (dst, "attn_layer_norm", "scale"), sd[f"{base}.attention.output.LayerNorm.weight"])
        _put(p, (dst, "attn_layer_norm", "bias"), sd[f"{base}.attention.output.LayerNorm.bias"])
        _put(p, (dst, "intermediate", "kernel"), _t(sd[f"{base}.intermediate.dense.weight"]))
        _put(p, (dst, "intermediate", "bias"), sd[f"{base}.intermediate.dense.bias"])
        _put(p, (dst, "output", "kernel"), _t(sd[f"{base}.output.dense.weight"]))
        _put(p, (dst, "output", "bias"), sd[f"{base}.output.dense.bias"])
        _put(p, (dst, "output_layer_norm", "scale"), sd[f"{base}.output.LayerNorm.weight"])
        _put(p, (dst, "output_layer_norm", "bias"), sd[f"{base}.output.LayerNorm.bias"])
    return p


def _unconv(k) -> np.ndarray:  # [k, in/g, out] -> [out, in/g, k]
    return np.ascontiguousarray(np.transpose(np.asarray(k), (2, 1, 0)))


def speech_flax_to_hf(params: Dict, config) -> Dict[str, np.ndarray]:
    """SpeechEncoderModel params → HF WavLM/Wav2Vec2/Hubert state dict.

    Inverse of :func:`speech_hf_to_flax`; used to export ``final_ssl.pt``
    checkpoints the reference's eval scripts can reload into HF models
    (reference: benchmark/train_eval_files/eval_cat_ser.py:115). The folded
    positional-conv kernel is re-decomposed into the torch weight_norm
    parametrization (v = kernel, g = ‖kernel‖ over dims (0,1)) — an exact
    decomposition of the same effective weight.
    """
    sd: Dict[str, np.ndarray] = {}

    def get(*path):
        node = params
        for k in path:
            node = node[k]
        return np.asarray(node)

    for i in range(len(config.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        sd[f"{base}.conv.weight"] = _unconv(get("feature_extractor", f"conv{i}", "kernel"))
        if config.conv_bias:
            sd[f"{base}.conv.bias"] = get("feature_extractor", f"conv{i}", "bias")
        if config.feat_extract_norm == "layer":
            sd[f"{base}.layer_norm.weight"] = get("feature_extractor", f"conv_ln{i}", "scale")
            sd[f"{base}.layer_norm.bias"] = get("feature_extractor", f"conv_ln{i}", "bias")
        elif i == 0:
            sd[f"{base}.layer_norm.weight"] = get("feature_extractor", "group_norm", "scale")
            sd[f"{base}.layer_norm.bias"] = get("feature_extractor", "group_norm", "bias")

    sd["feature_projection.layer_norm.weight"] = get("fp_layer_norm", "scale")
    sd["feature_projection.layer_norm.bias"] = get("fp_layer_norm", "bias")
    sd["feature_projection.projection.weight"] = get("fp_projection", "kernel").T
    sd["feature_projection.projection.bias"] = get("fp_projection", "bias")

    pos_kernel = _unconv(get("pos_conv_embed", "conv", "kernel"))  # [out, in/g, k]
    g = np.sqrt((pos_kernel ** 2).sum(axis=(0, 1), keepdims=True))  # [1,1,k]
    sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"] = g
    # v = kernel, g = ‖kernel‖ ⇒ effective weight g·v/‖v‖ == kernel exactly
    sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"] = pos_kernel
    sd["encoder.pos_conv_embed.conv.bias"] = get("pos_conv_embed", "conv", "bias")
    sd["encoder.layer_norm.weight"] = get("encoder_layer_norm", "scale")
    sd["encoder.layer_norm.bias"] = get("encoder_layer_norm", "bias")

    for i in range(config.num_layers):
        base = f"encoder.layers.{i}"
        src = f"layer{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{base}.attention.{proj}.weight"] = get(src, "attention", proj, "kernel").T
            sd[f"{base}.attention.{proj}.bias"] = get(src, "attention", proj, "bias")
        if config.attention_type == "wavlm":
            sd[f"{base}.attention.gru_rel_pos_linear.weight"] = get(
                src, "attention", "gru_rel_pos_linear", "kernel"
            ).T
            sd[f"{base}.attention.gru_rel_pos_linear.bias"] = get(
                src, "attention", "gru_rel_pos_linear", "bias"
            )
            sd[f"{base}.attention.gru_rel_pos_const"] = get(src, "attention", "gru_rel_pos_const")
            if i == 0:
                sd[f"{base}.attention.rel_attn_embed.weight"] = get(
                    src, "attention", "rel_attn_embed"
                )
        sd[f"{base}.layer_norm.weight"] = get(src, "layer_norm", "scale")
        sd[f"{base}.layer_norm.bias"] = get(src, "layer_norm", "bias")
        sd[f"{base}.final_layer_norm.weight"] = get(src, "final_layer_norm", "scale")
        sd[f"{base}.final_layer_norm.bias"] = get(src, "final_layer_norm", "bias")
        sd[f"{base}.feed_forward.intermediate_dense.weight"] = get(
            src, "feed_forward", "intermediate_dense", "kernel"
        ).T
        sd[f"{base}.feed_forward.intermediate_dense.bias"] = get(
            src, "feed_forward", "intermediate_dense", "bias"
        )
        sd[f"{base}.feed_forward.output_dense.weight"] = get(
            src, "feed_forward", "output_dense", "kernel"
        ).T
        sd[f"{base}.feed_forward.output_dense.bias"] = get(
            src, "feed_forward", "output_dense", "bias"
        )
    return sd


def roberta_flax_to_hf(params: Dict, config) -> Dict[str, np.ndarray]:
    """RobertaModel (flax) params → HF RobertaModel state dict.

    Inverse of :func:`roberta_hf_to_flax`; used by the joint roberta+wavlm
    fine-tune engine to export ``final_text_model.pt``
    (reference: bin/old/train_cat_roberta_wavlm_ftall.py:381-385).
    """

    def get(*path):
        node = params
        for k in path:
            node = node[k]
        return np.asarray(node)

    sd: Dict[str, np.ndarray] = {
        "embeddings.word_embeddings.weight": get("word_embeddings"),
        "embeddings.position_embeddings.weight": get("position_embeddings"),
        "embeddings.token_type_embeddings.weight": get("token_type_embeddings"),
        "embeddings.LayerNorm.weight": get("emb_layer_norm", "scale"),
        "embeddings.LayerNorm.bias": get("emb_layer_norm", "bias"),
    }
    for i in range(config.num_layers):
        base = f"encoder.layer.{i}"
        src = f"layer{i}"
        for name in ("query", "key", "value"):
            sd[f"{base}.attention.self.{name}.weight"] = get(src, "self", name, "kernel").T
            sd[f"{base}.attention.self.{name}.bias"] = get(src, "self", name, "bias")
        sd[f"{base}.attention.output.dense.weight"] = get(src, "attn_output", "kernel").T
        sd[f"{base}.attention.output.dense.bias"] = get(src, "attn_output", "bias")
        sd[f"{base}.attention.output.LayerNorm.weight"] = get(src, "attn_layer_norm", "scale")
        sd[f"{base}.attention.output.LayerNorm.bias"] = get(src, "attn_layer_norm", "bias")
        sd[f"{base}.intermediate.dense.weight"] = get(src, "intermediate", "kernel").T
        sd[f"{base}.intermediate.dense.bias"] = get(src, "intermediate", "bias")
        sd[f"{base}.output.dense.weight"] = get(src, "output", "kernel").T
        sd[f"{base}.output.dense.bias"] = get(src, "output", "bias")
        sd[f"{base}.output.LayerNorm.weight"] = get(src, "output_layer_norm", "scale")
        sd[f"{base}.output.LayerNorm.bias"] = get(src, "output_layer_norm", "bias")
    return sd
