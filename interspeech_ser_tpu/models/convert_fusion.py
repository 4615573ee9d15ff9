"""Fusion-classifier checkpoint conversion: torch state_dict ↔ flax params.

The reference saves fusion models as flat torch state dicts named
``multimodal_ser.pt`` (reference: bin/train_cat_bimodal_lazy_1head.py:491-492)
and reloads them for eval/test (eval_cat_bimodal_lazy_1head.py:304). These
converters keep that on-disk contract: reference-trained checkpoints load
into the flax model, and our training runs export checkpoints the reference
eval scripts can consume.

Name map (torch → flax):
    {mod}_projection.{weight,bias}      → {mod}_encoder/projection/{kernel.T,bias}
    {mod}_norm.{weight,bias}            → {mod}_encoder/norm/{scale,bias}
    {mod}_gru.weight_ih_l0[_reverse]    → {mod}_encoder/gru/w_ih_{fwd,bwd} (T)
    {mod}_gru.weight_hh_l0[_reverse]    → {mod}_encoder/gru/w_hh_{fwd,bwd} (T)
    {mod}_gru.bias_{ih,hh}_l0[_reverse] → {mod}_encoder/gru/b_{ih,hh}_{fwd,bwd}
    {mod}_attention.in_proj_weight/bias → {mod}_attention/in_proj_{kernel.T,bias}
    {mod}_attention.out_proj.weight/bias→ {mod}_attention/{out_kernel.T,out_bias}
    {mod}_attn.{weight,bias}            → {mod}_pool_attn/{kernel.T,bias}
    layer_norm.{weight,bias}            → fusion_norm/{scale,bias}
    classifier.{0,3}.{weight,bias}      → classifier_fc{1,2}/{kernel.T,bias}
    neutral_classifier.{0,3}.*          → neutral_fc{1,2}/*
(torch Linear weights are [out, in]; flax Dense kernels are [in, out].)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .fusion import MODALITY_NAMES

# torch {mod}_attn (pooling Linear) vs {mod}_attention (MHA): keep distinct.


def _n_modalities(num_feat_dims: int):
    return MODALITY_NAMES[:num_feat_dims]


def torch_to_flax(sd: Dict[str, np.ndarray], n_mod: int) -> Dict:
    """Flat torch state dict → nested flax param dict (numpy leaves)."""
    p: Dict = {}

    def put(path, value):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(value)

    for mod in _n_modalities(n_mod):
        enc = f"{mod}_encoder"
        put((enc, "projection", "kernel"), sd[f"{mod}_projection.weight"].T)
        put((enc, "projection", "bias"), sd[f"{mod}_projection.bias"])
        if f"{mod}_norm.weight" in sd:  # absent in the gender_svm variant
            put((enc, "norm", "scale"), sd[f"{mod}_norm.weight"])
            put((enc, "norm", "bias"), sd[f"{mod}_norm.bias"])
        for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
            put((enc, "gru", f"w_ih_{d}"), sd[f"{mod}_gru.weight_ih_l0{suffix}"].T)
            put((enc, "gru", f"w_hh_{d}"), sd[f"{mod}_gru.weight_hh_l0{suffix}"].T)
            put((enc, "gru", f"b_ih_{d}"), sd[f"{mod}_gru.bias_ih_l0{suffix}"])
            put((enc, "gru", f"b_hh_{d}"), sd[f"{mod}_gru.bias_hh_l0{suffix}"])
        att = f"{mod}_attention"
        put((att, "in_proj_kernel"), sd[f"{att}.in_proj_weight"].T)
        put((att, "in_proj_bias"), sd[f"{att}.in_proj_bias"])
        put((att, "out_kernel"), sd[f"{att}.out_proj.weight"].T)
        put((att, "out_bias"), sd[f"{att}.out_proj.bias"])
        put((f"{mod}_pool_attn", "kernel"), sd[f"{mod}_attn.weight"].T)
        put((f"{mod}_pool_attn", "bias"), sd[f"{mod}_attn.bias"])
        if f"{mod}_gate.weight" in sd:  # fiona's pooled-rep gates
            put((f"{mod}_gate", "kernel"), sd[f"{mod}_gate.weight"].T)
            put((f"{mod}_gate", "bias"), sd[f"{mod}_gate.bias"])

    put(("fusion_norm", "scale"), sd["layer_norm.weight"])
    put(("fusion_norm", "bias"), sd["layer_norm.bias"])
    put(("classifier_fc1", "kernel"), sd["classifier.0.weight"].T)
    put(("classifier_fc1", "bias"), sd["classifier.0.bias"])
    put(("classifier_fc2", "kernel"), sd["classifier.3.weight"].T)
    put(("classifier_fc2", "bias"), sd["classifier.3.bias"])
    if "neutral_classifier.0.weight" in sd:
        put(("neutral_fc1", "kernel"), sd["neutral_classifier.0.weight"].T)
        put(("neutral_fc1", "bias"), sd["neutral_classifier.0.bias"])
        put(("neutral_fc2", "kernel"), sd["neutral_classifier.3.weight"].T)
        put(("neutral_fc2", "bias"), sd["neutral_classifier.3.bias"])
    return p


def flax_to_torch(params: Dict, n_mod: int) -> Dict[str, np.ndarray]:
    """Nested flax param dict → flat torch state dict (numpy values)."""
    sd: Dict[str, np.ndarray] = {}

    def get(*path):
        node = params
        for k in path:
            node = node[k]
        return np.asarray(node)

    for mod in _n_modalities(n_mod):
        enc = f"{mod}_encoder"
        sd[f"{mod}_projection.weight"] = get(enc, "projection", "kernel").T
        sd[f"{mod}_projection.bias"] = get(enc, "projection", "bias")
        if "norm" in params[enc]:  # absent in the gender_svm variant
            sd[f"{mod}_norm.weight"] = get(enc, "norm", "scale")
            sd[f"{mod}_norm.bias"] = get(enc, "norm", "bias")
        for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
            sd[f"{mod}_gru.weight_ih_l0{suffix}"] = get(enc, "gru", f"w_ih_{d}").T
            sd[f"{mod}_gru.weight_hh_l0{suffix}"] = get(enc, "gru", f"w_hh_{d}").T
            sd[f"{mod}_gru.bias_ih_l0{suffix}"] = get(enc, "gru", f"b_ih_{d}")
            sd[f"{mod}_gru.bias_hh_l0{suffix}"] = get(enc, "gru", f"b_hh_{d}")
        att = f"{mod}_attention"
        sd[f"{att}.in_proj_weight"] = get(att, "in_proj_kernel").T
        sd[f"{att}.in_proj_bias"] = get(att, "in_proj_bias")
        sd[f"{att}.out_proj.weight"] = get(att, "out_kernel").T
        sd[f"{att}.out_proj.bias"] = get(att, "out_bias")
        sd[f"{mod}_attn.weight"] = get(f"{mod}_pool_attn", "kernel").T
        sd[f"{mod}_attn.bias"] = get(f"{mod}_pool_attn", "bias")
        if f"{mod}_gate" in params:  # fiona's pooled-rep gates
            sd[f"{mod}_gate.weight"] = get(f"{mod}_gate", "kernel").T
            sd[f"{mod}_gate.bias"] = get(f"{mod}_gate", "bias")

    sd["layer_norm.weight"] = get("fusion_norm", "scale")
    sd["layer_norm.bias"] = get("fusion_norm", "bias")
    sd["classifier.0.weight"] = get("classifier_fc1", "kernel").T
    sd["classifier.0.bias"] = get("classifier_fc1", "bias")
    sd["classifier.3.weight"] = get("classifier_fc2", "kernel").T
    sd["classifier.3.bias"] = get("classifier_fc2", "bias")
    if "neutral_fc1" in params:
        sd["neutral_classifier.0.weight"] = get("neutral_fc1", "kernel").T
        sd["neutral_classifier.0.bias"] = get("neutral_fc1", "bias")
        sd["neutral_classifier.3.weight"] = get("neutral_fc2", "kernel").T
        sd["neutral_classifier.3.bias"] = get("neutral_fc2", "bias")
    return sd
