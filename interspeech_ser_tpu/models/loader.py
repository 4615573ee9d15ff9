"""HF checkpoint loading glue for the extraction CLIs.

Reads a local HF model directory (or hub cache) — ``config.json`` +
``model.safetensors`` / ``pytorch_model.bin`` (sharded or not) — straight
into flax params WITHOUT instantiating a torch model (keeps the 2B-param
XLS-R load at one copy in host RAM). Accepts the same model names/paths the
reference passes to ``AutoModel.from_pretrained``
(reference: preprocessing/preprocess_speech.py:111-112).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np


def _resolve_dir(path_or_name: str) -> str:
    if os.path.isdir(path_or_name):
        return path_or_name
    # fall back to transformers' resolution (hub cache; no-network envs
    # raise a clear error here, matching the reference's failure mode)
    from transformers.utils import cached_file

    cfg = cached_file(path_or_name, "config.json")
    return os.path.dirname(cfg)


def load_hf_state_dict(path_or_name: str) -> Dict[str, np.ndarray]:
    d = _resolve_dir(path_or_name)
    sd: Dict[str, np.ndarray] = {}

    def load_safetensors(fp):
        from safetensors.numpy import load_file

        sd.update(load_file(fp))

    def load_torch_bin(fp):
        import torch

        for k, v in torch.load(fp, map_location="cpu", weights_only=True).items():
            sd[k] = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()

    for index_name, loader, pat in (
        ("model.safetensors.index.json", load_safetensors, "model.safetensors"),
        ("pytorch_model.bin.index.json", load_torch_bin, "pytorch_model.bin"),
    ):
        idx = os.path.join(d, index_name)
        if os.path.exists(idx):
            with open(idx) as f:
                shards = sorted(set(json.load(f)["weight_map"].values()))
            for s in shards:
                loader(os.path.join(d, s))
            return sd
        single = os.path.join(d, pat)
        if os.path.exists(single):
            loader(single)
            return sd
    raise FileNotFoundError(f"no model weights found under {d}")


def _strip_prefix(sd: Dict[str, np.ndarray], prefixes) -> Dict[str, np.ndarray]:
    for p in prefixes:
        if any(k.startswith(p) for k in sd):
            return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
    return sd


def build_speech_encoder(path_or_name: str, dtype: str = "float32"):
    """→ (model, params, config, do_normalize) for WavLM/w2v2/HuBERT."""
    from transformers import AutoConfig

    from .convert_hf import speech_hf_to_flax
    from .speech import SpeechConfig, SpeechEncoderModel

    hf_cfg = AutoConfig.from_pretrained(_resolve_dir(path_or_name))
    cfg = SpeechConfig.from_hf(hf_cfg, dtype=dtype)
    sd = load_hf_state_dict(path_or_name)
    sd = _strip_prefix(sd, ("wavlm.", "wav2vec2.", "hubert."))
    params = speech_hf_to_flax(sd, cfg)

    do_normalize = True
    pp = os.path.join(_resolve_dir(path_or_name), "preprocessor_config.json")
    if os.path.exists(pp):
        with open(pp) as f:
            do_normalize = bool(json.load(f).get("do_normalize", True))
    # NOTE: the loader stays kernel-neutral — it serves training engines
    # (joint/baseline/LoRA fine-tunes) as well as extraction. Inference
    # pipelines opt into the no-vjp Pallas kernels themselves
    # (SpeechExtractionPipeline enables cfg.inference_kernels).
    return SpeechEncoderModel(cfg), params, cfg, do_normalize


def build_whisper_encoder(path_or_name: str, dtype: str = "float32"):
    from transformers import AutoConfig

    from .convert_hf import whisper_encoder_hf_to_flax
    from .whisper import WhisperEncoderConfig, WhisperEncoderModel

    hf_cfg = AutoConfig.from_pretrained(_resolve_dir(path_or_name))
    cfg = WhisperEncoderConfig.from_hf(hf_cfg, dtype=dtype)
    sd = load_hf_state_dict(path_or_name)
    params = whisper_encoder_hf_to_flax(sd, cfg)
    return WhisperEncoderModel(cfg), params, cfg


def build_roberta(path_or_name: str, dtype: str = "float32"):
    from transformers import AutoConfig

    from .convert_hf import roberta_hf_to_flax
    from .text import RobertaConfig, RobertaModel

    hf_cfg = AutoConfig.from_pretrained(_resolve_dir(path_or_name))
    cfg = RobertaConfig.from_hf(hf_cfg, dtype=dtype)
    sd = _strip_prefix(load_hf_state_dict(path_or_name), ("roberta.",))
    params = roberta_hf_to_flax(sd, cfg)
    return RobertaModel(cfg), params, cfg


def build_deberta_v2(path_or_name: str, dtype: str = "float32"):
    from transformers import AutoConfig

    from .convert_hf import deberta_v2_hf_to_flax
    from .text import DebertaV2Config, DebertaV2Model

    hf_cfg = AutoConfig.from_pretrained(_resolve_dir(path_or_name))
    cfg = DebertaV2Config.from_hf(hf_cfg, dtype=dtype)
    sd = _strip_prefix(load_hf_state_dict(path_or_name), ("deberta.",))
    params = deberta_v2_hf_to_flax(sd, cfg)
    return DebertaV2Model(cfg), params, cfg
