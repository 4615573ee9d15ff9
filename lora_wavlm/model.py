#!/usr/bin/env python
"""LoRA WavLM wrapper (TPU-native surface of reference lora_wavlm/model.py).

``build_wavlm_wrapper`` returns the flax pieces equivalent to the
reference's ``WavLMWrapper`` (lora_wavlm/model.py:87-213): a speech encoder
with LoRA factors on the FFN dense layers (loralib semantics, L40-42) plus
the layer-weighted conv head (``WavLMWrapperModel``).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from interspeech_ser_tpu.models import lora as lora_lib
from interspeech_ser_tpu.models.loader import build_speech_encoder
from interspeech_ser_tpu.train.lora_engine import WavLMWrapperModel


def build_wavlm_wrapper(
    ssl_type: str = "microsoft/wavlm-base-plus",
    finetune_method: str = "lora",
    lora_rank: int = 16,
    hidden_dim: int = 256,
    output_class_num: int = 4,
    use_conv_output: bool = True,
    seed: int = 7,
):
    """→ (encoder_model, base_params, tuned_tree, head_model, head_params).

    ``finetune_method``: 'lora' (tuned_tree = LoRA factors on the FFN
    denses), 'adapter' | 'adapter_l' | 'embedding_prompt' | 'combined'
    (tuned_tree = the adapter/prompt subtrees split out of the encoder
    params; merge back with ``lora.merge_finetune_params``). The reference
    never defines its Adapter class (lora_wavlm/model.py:45 uses an
    unbound name); see models/speech.py Adapter for the spec used here.
    """
    import dataclasses as _dc

    model, params, cfg, _ = build_speech_encoder(ssl_type)
    key = jax.random.PRNGKey(seed)
    k_lora, k_head = jax.random.split(key)
    lora = {}
    if finetune_method in ("lora", "combined"):
        lora = lora_lib.init_lora(
            k_lora, params, lora_lib.match_ffn_dense, lora_rank
        )
    if finetune_method in ("adapter", "adapter_l", "embedding_prompt", "combined"):
        from interspeech_ser_tpu.models.speech import SpeechEncoderModel

        cfg = _dc.replace(cfg, finetune_method=finetune_method)
        model = SpeechEncoderModel(cfg)
        full = lora_lib.add_finetune_params(k_lora, model, params)
        params, tuned = lora_lib.split_finetune_params(full)
        if finetune_method == "combined":
            lora = {"lora": lora, "finetune": tuned}
        else:
            lora = tuned
    head = WavLMWrapperModel(
        num_layers=cfg.num_layers,
        hidden_size=cfg.hidden_size,
        hidden_dim=hidden_dim,
        output_class_num=output_class_num,
        use_conv_output=use_conv_output,
    )
    import jax.numpy as jnp

    dummy_hs = [jnp.zeros((1, 4, cfg.hidden_size))] * (cfg.num_layers + 1)
    head_params = head.init(k_head, dummy_hs)["params"]
    return model, params, lora, head, head_params
