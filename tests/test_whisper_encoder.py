"""Golden parity: Whisper encoder + log-mel frontend vs HF (random small cfg)."""

import numpy as np
import torch

import jax.numpy as jnp

from interspeech_ser_tpu.models.convert_hf import whisper_encoder_hf_to_flax
from interspeech_ser_tpu.models.whisper import (
    WhisperEncoderConfig,
    WhisperEncoderModel,
    sinusoidal_positions,
)
from interspeech_ser_tpu.ops.mel import mel_filter_bank_slaney, whisper_log_mel

RNG = np.random.default_rng(6)


def _build_hf_whisper():
    from transformers import WhisperConfig, WhisperModel

    torch.manual_seed(0)
    cfg = WhisperConfig(
        num_mel_bins=16,
        d_model=32,
        encoder_layers=3,
        encoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_layers=1,
        decoder_attention_heads=4,
        decoder_ffn_dim=64,
        max_source_positions=60,
    )
    model = WhisperModel(cfg).encoder
    model.eval()
    return cfg, model


class TestMelFrontend:
    def test_filter_bank_matches_transformers(self):
        from transformers.audio_utils import mel_filter_bank

        ref = mel_filter_bank(
            num_frequency_bins=201, num_mel_filters=128, min_frequency=0.0,
            max_frequency=8000.0, sampling_rate=16000, norm="slaney",
            mel_scale="slaney",
        )
        ours = mel_filter_bank_slaney(201, 128, 0.0, 8000.0, 16000)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_log_mel_matches_hf_feature_extractor(self):
        from transformers import WhisperFeatureExtractor

        fe = WhisperFeatureExtractor(feature_size=128)
        wav = RNG.normal(size=24000).astype(np.float32) * 0.1
        ref = fe(wav, sampling_rate=16000, return_tensors="np").input_features[0]
        padded = np.zeros((1, 480000), np.float32)
        padded[0, : len(wav)] = wav
        ours = np.asarray(whisper_log_mel(jnp.asarray(padded)))[0]
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestWhisperEncoderParity:
    def test_hidden_states_match(self):
        hf_cfg, hf_enc = _build_hf_whisper()
        cfg = WhisperEncoderConfig.from_hf(hf_cfg)
        model = WhisperEncoderModel(cfg)
        params = whisper_encoder_hf_to_flax(
            {k: v.numpy() for k, v in hf_enc.state_dict().items()}, cfg
        )
        T_mel = hf_cfg.max_source_positions * 2
        mel = RNG.normal(size=(2, hf_cfg.num_mel_bins, T_mel)).astype(np.float32)
        with torch.no_grad():
            ref = hf_enc(torch.tensor(mel), output_hidden_states=True)
        ours = model.apply({"params": params}, jnp.asarray(mel))
        assert len(ref.hidden_states) == len(ours["hidden_states"])
        for i, (r, o) in enumerate(zip(ref.hidden_states, ours["hidden_states"])):
            np.testing.assert_allclose(
                np.asarray(o), r.numpy(), atol=2e-4, err_msg=f"hidden_states[{i}]"
            )

    def test_sinusoid_table_matches_hf_init(self):
        hf_cfg, hf_enc = _build_hf_whisper()
        ref = hf_enc.embed_positions.weight.detach().numpy()
        ours = sinusoidal_positions(hf_cfg.max_source_positions, hf_cfg.d_model)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestFusedQKVWhisper:
    def test_fused_qkv_matches_split(self):
        """fuse_qkv_params_whisper + fused_qkv=True is exact (k bias = 0)."""
        import dataclasses

        from interspeech_ser_tpu.models.whisper import fuse_qkv_params_whisper

        hf_cfg, hf_enc = _build_hf_whisper()
        cfg = WhisperEncoderConfig.from_hf(hf_cfg)
        model = WhisperEncoderModel(cfg)
        params = whisper_encoder_hf_to_flax(
            {k: v.numpy() for k, v in hf_enc.state_dict().items()}, cfg
        )
        mel = jnp.asarray(RNG.normal(size=(2, 16, 120)).astype(np.float32))
        ref = model.apply({"params": params}, mel)

        fcfg = dataclasses.replace(cfg, fused_qkv=True)
        fparams = fuse_qkv_params_whisper(params)
        attn0 = fparams["layer0"]["self_attn"]
        assert "q_proj" not in attn0
        D = cfg.d_model
        assert attn0["qkv_proj"]["kernel"].shape == (D, 3 * D)
        assert attn0["qkv_proj"]["bias"].shape == (3 * D,)
        # k-slice of the fused bias must be exactly zero
        np.testing.assert_array_equal(
            np.asarray(attn0["qkv_proj"]["bias"][D : 2 * D]), 0.0
        )
        got = WhisperEncoderModel(fcfg).apply({"params": fparams}, mel)
        for i, (r, o) in enumerate(zip(ref["hidden_states"], got["hidden_states"])):
            np.testing.assert_allclose(
                np.asarray(o), np.asarray(r), atol=1e-5,
                err_msg=f"hidden_states[{i}]",
            )
