"""Whisper decoder parity + greedy generation vs torch reference loop."""

import os
import sys

import numpy as np
import torch

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.models.whisper_decoder import (
    WhisperDecoderConfig,
    WhisperDecoderModel,
    greedy_decode,
    whisper_decoder_hf_to_flax,
)

RNG = np.random.default_rng(15)


def _build():
    from transformers import WhisperConfig, WhisperModel

    torch.manual_seed(12)
    hf_cfg = WhisperConfig(
        vocab_size=100, num_mel_bins=16, d_model=32,
        encoder_layers=1, encoder_attention_heads=4, encoder_ffn_dim=64,
        decoder_layers=2, decoder_attention_heads=4, decoder_ffn_dim=64,
        max_source_positions=30, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=None, begin_suppress_tokens=None,
    )
    model = WhisperModel(hf_cfg)
    model.eval()
    cfg = WhisperDecoderConfig.from_hf(hf_cfg)
    params = whisper_decoder_hf_to_flax(
        {k: v.numpy() for k, v in model.decoder.state_dict().items()}, cfg
    )
    return hf_cfg, model, cfg, WhisperDecoderModel(cfg), params


class TestDecoderParity:
    def test_teacher_forced_logits_match(self):
        hf_cfg, model, cfg, dec, params = _build()
        B, S, T = 2, 12, 7
        enc = RNG.normal(size=(B, S, 32)).astype(np.float32)
        ids = RNG.integers(0, 100, size=(B, T))
        with torch.no_grad():
            out = model.decoder(
                input_ids=torch.tensor(ids), encoder_hidden_states=torch.tensor(enc)
            ).last_hidden_state
            ref_logits = out @ model.decoder.embed_tokens.weight.T
        ours = dec.apply({"params": params}, jnp.asarray(ids), jnp.asarray(enc))
        np.testing.assert_allclose(np.asarray(ours), ref_logits.numpy(), atol=3e-4)

    def test_greedy_matches_torch_loop(self):
        hf_cfg, model, cfg, dec, params = _build()
        B, S = 2, 12
        enc = RNG.normal(size=(B, S, 32)).astype(np.float32)
        prompt = np.asarray([hf_cfg.decoder_start_token_id], np.int64)
        eot = 3
        max_new = 8

        # torch greedy reference (full re-forward per step)
        tokens = torch.tensor(np.tile(prompt, (B, 1)))
        finished = torch.zeros(B, dtype=torch.bool)
        with torch.no_grad():
            for _ in range(max_new):
                out = model.decoder(
                    input_ids=tokens, encoder_hidden_states=torch.tensor(enc)
                ).last_hidden_state
                logits = out[:, -1] @ model.decoder.embed_tokens.weight.T
                nxt = logits.argmax(-1)
                nxt = torch.where(finished, torch.full_like(nxt, eot), nxt)
                finished |= nxt == eot
                tokens = torch.cat([tokens, nxt[:, None]], dim=1)

        ours = np.asarray(
            greedy_decode(dec, params, jnp.asarray(enc), prompt, eot, max_new)
        )
        np.testing.assert_array_equal(ours, tokens.numpy())


class TestCachedGreedy:
    def test_cached_matches_recompute_path(self):
        from interspeech_ser_tpu.models.whisper_decoder import greedy_decode_cached

        hf_cfg, model, cfg, dec, params = _build()
        B, S = 2, 12
        enc = RNG.normal(size=(B, S, 32)).astype(np.float32)
        prompt = np.asarray([hf_cfg.decoder_start_token_id, 5], np.int64)
        eot = 3
        ref = np.asarray(
            greedy_decode(dec, params, jnp.asarray(enc), prompt, eot, 8)
        )
        ours = np.asarray(
            greedy_decode_cached(dec, params, jnp.asarray(enc), prompt, eot, 8)
        )
        np.testing.assert_array_equal(ours, ref)

    def test_cached_with_suppression(self):
        from interspeech_ser_tpu.models.whisper_decoder import greedy_decode_cached

        hf_cfg, model, cfg, dec, params = _build()
        enc = RNG.normal(size=(1, 10, 32)).astype(np.float32)
        prompt = np.asarray([hf_cfg.decoder_start_token_id], np.int64)
        sup = np.arange(10, 60)
        ref = np.asarray(
            greedy_decode(dec, params, jnp.asarray(enc), prompt, 3, 6, suppress_ids=sup)
        )
        ours = np.asarray(
            greedy_decode_cached(dec, params, jnp.asarray(enc), prompt, 3, 6, suppress_ids=sup)
        )
        np.testing.assert_array_equal(ours, ref)
