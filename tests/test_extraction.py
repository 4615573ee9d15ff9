"""End-to-end extraction: wav dir → .pt dumps, parity vs HF batch-1 path.

Exercises the real ``preprocessing/`` CLI surface with a tiny random HF
WavLM/Whisper saved via save_pretrained, PCM16 wavs written through the
stdlib wave module, and per-file comparison against the reference
computation (HF torch forward, batch 1, layer select / mean-last-4 /
dir-count bug replication).
"""

import os
import struct
import sys
import wave as wave_mod

import numpy as np
import pytest
import torch

ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, ROOT)

RNG = np.random.default_rng(9)


def write_wav(path, samples, sr=16000):
    x = np.clip(np.asarray(samples), -1, 1)
    pcm = (x * 32767).astype("<i2")
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    for i, n in enumerate([4000, 7000, 9500, 12000, 3000]):
        write_wav(str(d / f"utt{i}.wav"), RNG.normal(size=n) * 0.1)
    return str(d)


@pytest.fixture(scope="module")
def hf_wavlm_dir(tmp_path_factory):
    from transformers import WavLMConfig, WavLMModel

    torch.manual_seed(2)
    cfg = WavLMConfig(
        hidden_size=48, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=96, conv_dim=[16, 16, 16], conv_kernel=[10, 3, 3],
        conv_stride=[5, 2, 2], num_feat_extract_layers=3,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=32, max_bucket_distance=64, do_stable_layer_norm=True,
        feat_extract_norm="layer", conv_bias=True, layerdrop=0.0,
    )
    model = WavLMModel(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("hf_wavlm")
    model.save_pretrained(str(d))
    return str(d), model


class TestSpeechExtractionCLI:
    def test_outputs_match_hf_batch1(self, wav_dir, hf_wavlm_dir, tmp_path):
        from interspeech_ser_tpu.preprocess_cli import speech_main
        from interspeech_ser_tpu.utils.audio import load_wav, normalize_waveform

        model_dir, hf_model = hf_wavlm_dir
        save = str(tmp_path / "feats")
        stats = speech_main(
            ["--ssl_type", model_dir, "--wav_dir", wav_dir, "--save_path", save]
        )
        assert stats.n_utts == 5 and stats.n_failed == 0

        for f in sorted(os.listdir(wav_dir)):
            y, _ = load_wav(os.path.join(wav_dir, f))
            x = normalize_waveform(y)
            with torch.no_grad():
                ref = hf_model(torch.tensor(x[None])).last_hidden_state[0].numpy()
            ours = torch.load(
                os.path.join(save, f.replace(".wav", ".pt")), weights_only=True
            ).numpy()
            assert ours.shape == ref.shape
            cos = np.sum(ours * ref) / (np.linalg.norm(ours) * np.linalg.norm(ref))
            assert cos > 0.9999, f"{f}: cosine {cos}"
            np.testing.assert_allclose(ours, ref, atol=5e-4)

    def test_mean_last4_and_bug_replication(self, wav_dir, hf_wavlm_dir, tmp_path):
        from interspeech_ser_tpu.preprocess_cli import speech_main
        from interspeech_ser_tpu.utils.audio import load_wav, normalize_waveform

        model_dir, hf_model = hf_wavlm_dir
        save = str(tmp_path / "avg")
        speech_main(
            ["--ssl_type", model_dir, "--wav_dir", wav_dir, "--save_path", save,
             "--use_average", "y"]
        )
        f = sorted(os.listdir(wav_dir))[0]
        y, _ = load_wav(os.path.join(wav_dir, f))
        x = normalize_waveform(y)
        with torch.no_grad():
            hs = hf_model(torch.tensor(x[None]), output_hidden_states=True).hidden_states
        ref = torch.stack(hs[-4:]).mean(0)[0].numpy()
        ours = torch.load(os.path.join(save, f.replace(".wav", ".pt")), weights_only=True).numpy()
        np.testing.assert_allclose(ours, ref, atol=5e-4)

        # dir-count bug replication: save dir pre-seeded with 2 junk files
        # → layer index 2 (reference preprocess_speech.py:41,67)
        save2 = str(tmp_path / "bug")
        os.makedirs(save2)
        open(os.path.join(save2, "junk1"), "w").close()
        open(os.path.join(save2, "junk2"), "w").close()
        speech_main(
            ["--ssl_type", model_dir, "--wav_dir", wav_dir, "--save_path", save2,
             "--replicate_dir_count_bug"]
        )
        ref2 = hs[2][0].numpy()
        ours2 = torch.load(os.path.join(save2, f.replace(".wav", ".pt")), weights_only=True).numpy()
        np.testing.assert_allclose(ours2, ref2, atol=5e-4)


class TestWhisperExtraction:
    def test_outputs_match_hf(self, wav_dir, tmp_path):
        from transformers import WhisperConfig, WhisperModel

        torch.manual_seed(3)
        hf_cfg = WhisperConfig(
            num_mel_bins=16, d_model=32, encoder_layers=2, encoder_attention_heads=4,
            encoder_ffn_dim=64, decoder_layers=1, decoder_attention_heads=4,
            decoder_ffn_dim=64, max_source_positions=1500,
        )
        enc = WhisperModel(hf_cfg).encoder
        enc.eval()
        d = tmp_path / "hf_whisper"
        enc.save_pretrained(str(d))

        from interspeech_ser_tpu.preprocess_cli import whisper_main
        from interspeech_ser_tpu.ops.mel import whisper_log_mel
        from interspeech_ser_tpu.utils.audio import load_wav

        import jax.numpy as jnp
        import math

        save = str(tmp_path / "feats")
        stats = whisper_main(
            ["--ssl_type", str(d), "--wav_dir", wav_dir, "--save_path", save]
        )
        assert stats.n_utts == 5

        f = sorted(os.listdir(wav_dir))[1]
        y, _ = load_wav(os.path.join(wav_dir, f))
        padded = np.zeros((1, 480000), np.float32)
        padded[0, : len(y)] = y
        mel = np.asarray(whisper_log_mel(jnp.asarray(padded), num_mels=16))
        with torch.no_grad():
            ref = enc(torch.tensor(mel)).last_hidden_state[0].numpy()
        n_frames = math.ceil(len(y) / 320)
        ours = torch.load(os.path.join(save, f.replace(".wav", ".pt")), weights_only=True).numpy()
        assert ours.shape[0] == n_frames
        np.testing.assert_allclose(ours, ref[:n_frames], atol=5e-4)


class TestTextExtractionPipeline:
    def test_full_padded_output_saved(self, tmp_path):
        from transformers import RobertaConfig as HFC, RobertaModel as HFM

        from interspeech_ser_tpu.extract.pipeline import TextExtractionPipeline
        from interspeech_ser_tpu.models.convert_hf import roberta_hf_to_flax
        from interspeech_ser_tpu.models.text import RobertaConfig, RobertaModel

        torch.manual_seed(4)
        hf_cfg = HFC(
            vocab_size=120, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=96, type_vocab_size=1, pad_token_id=1,
        )
        hf = HFM(hf_cfg, add_pooling_layer=False)
        hf.eval()
        cfg = RobertaConfig.from_hf(hf_cfg)
        params = roberta_hf_to_flax({k: v.numpy() for k, v in hf.state_dict().items()}, cfg)

        max_len = 12

        def fake_tokenize(texts):
            ids = np.full((len(texts), max_len), 1, np.int64)
            mask = np.zeros((len(texts), max_len), np.int64)
            for i, t in enumerate(texts):
                n = min(3 + len(t) % 5, max_len)
                ids[i, :n] = RNG.integers(3, 120, n)
                mask[i, :n] = 1
            return {"input_ids": ids, "attention_mask": mask}

        pipe = TextExtractionPipeline(
            RobertaModel(cfg), params, fake_tokenize, max_length=max_len, batch_size=4
        )
        names = [f"u{i}.wav" for i in range(6)]
        texts = [f"text {i}" for i in range(6)]
        save = str(tmp_path / "txt")
        stats = pipe.run(names, texts, save)
        assert stats.n_utts == 6
        for n in names:
            arr = torch.load(os.path.join(save, n.replace(".wav", ".pt")), weights_only=True)
            assert arr.shape == (max_len, 32)  # FULL padded length saved


class TestShardMapKernelExtraction:
    def test_dp_shard_map_with_kernels_matches_single_device(
        self, wav_dir, hf_wavlm_dir, tmp_path, monkeypatch
    ):
        """8-device DP extraction runs per-shard under shard_map, so the
        Pallas attention kernel may engage there (forced on here, interpret
        mode on CPU) — outputs must equal the single-device XLA path and
        the fused-frontend variant must agree too."""
        from interspeech_ser_tpu.extract.pipeline import SpeechExtractionPipeline
        from interspeech_ser_tpu.models.convert_hf import speech_hf_to_flax
        from interspeech_ser_tpu.models.speech import SpeechConfig, SpeechEncoderModel

        model_dir, hf_model = hf_wavlm_dir
        from transformers import AutoConfig

        cfg = SpeechConfig.from_hf(AutoConfig.from_pretrained(model_dir))
        model = SpeechEncoderModel(cfg)
        params = speech_hf_to_flax(
            {k: v.numpy() for k, v in hf_model.state_dict().items()}, cfg
        )
        save_1 = str(tmp_path / "one")
        save_8 = str(tmp_path / "eight")
        save_8f = str(tmp_path / "eight_fused")
        SpeechExtractionPipeline(model, params, cfg, n_devices=1).run(wav_dir, save_1)
        monkeypatch.setenv("SER_TPU_ATTN_IMPL", "oneshot2")
        SpeechExtractionPipeline(model, params, cfg, n_devices=8).run(wav_dir, save_8)
        fused = SpeechEncoderModel(cfg, fused_frontend=2)
        SpeechExtractionPipeline(fused, params, cfg, n_devices=8).run(
            wav_dir, save_8f
        )
        for f in sorted(os.listdir(save_1)):
            a = torch.load(os.path.join(save_1, f), weights_only=True).numpy()
            b = torch.load(os.path.join(save_8, f), weights_only=True).numpy()
            c = torch.load(os.path.join(save_8f, f), weights_only=True).numpy()
            np.testing.assert_allclose(b, a, atol=2e-4)
            np.testing.assert_allclose(c, a, atol=2e-4)


class TestTensorParallelExtraction:
    def test_tp_matches_dp(self, wav_dir, hf_wavlm_dir, tmp_path):
        """model_parallel=2 extraction == data-parallel extraction."""
        from interspeech_ser_tpu.extract.pipeline import SpeechExtractionPipeline
        from interspeech_ser_tpu.models.convert_hf import speech_hf_to_flax
        from interspeech_ser_tpu.models.speech import SpeechConfig, SpeechEncoderModel

        model_dir, hf_model = hf_wavlm_dir
        from transformers import AutoConfig

        cfg = SpeechConfig.from_hf(AutoConfig.from_pretrained(model_dir))
        model = SpeechEncoderModel(cfg)
        params = speech_hf_to_flax(
            {k: v.numpy() for k, v in hf_model.state_dict().items()}, cfg
        )
        save_dp = str(tmp_path / "dp")
        save_tp = str(tmp_path / "tp")
        SpeechExtractionPipeline(model, params, cfg).run(wav_dir, save_dp)
        SpeechExtractionPipeline(model, params, cfg, model_parallel=2).run(
            wav_dir, save_tp
        )
        for f in sorted(os.listdir(save_dp)):
            a = torch.load(os.path.join(save_dp, f), weights_only=True).numpy()
            b = torch.load(os.path.join(save_tp, f), weights_only=True).numpy()
            np.testing.assert_allclose(a, b, atol=2e-4)


class TestFusedQKVExtraction:
    def test_env_optin_matches_default(self, wav_dir, hf_wavlm_dir, tmp_path, monkeypatch):
        """SER_TPU_FUSED_QKV=1 rewrites params to the fused layout inside
        the pipeline; .pt outputs must equal the split-projection path."""
        from transformers import AutoConfig

        from interspeech_ser_tpu.extract.pipeline import SpeechExtractionPipeline
        from interspeech_ser_tpu.models.convert_hf import speech_hf_to_flax
        from interspeech_ser_tpu.models.speech import SpeechConfig, SpeechEncoderModel

        model_dir, hf_model = hf_wavlm_dir
        cfg = SpeechConfig.from_hf(AutoConfig.from_pretrained(model_dir))
        model = SpeechEncoderModel(cfg)
        params = speech_hf_to_flax(
            {k: v.numpy() for k, v in hf_model.state_dict().items()}, cfg
        )
        save_a, save_b = str(tmp_path / "split"), str(tmp_path / "fusedqkv")
        SpeechExtractionPipeline(model, params, cfg, n_devices=1).run(wav_dir, save_a)
        monkeypatch.setenv("SER_TPU_FUSED_QKV", "1")
        pipe = SpeechExtractionPipeline(model, params, cfg, n_devices=1)
        assert pipe.config.fused_qkv
        pipe.run(wav_dir, save_b)
        for f in sorted(os.listdir(save_a)):
            a = torch.load(os.path.join(save_a, f), weights_only=True).numpy()
            b = torch.load(os.path.join(save_b, f), weights_only=True).numpy()
            np.testing.assert_allclose(b, a, atol=2e-4)


class TestSkipExistingResume:
    def test_resume_skips_done_files_and_matches(
        self, wav_dir, hf_wavlm_dir, tmp_path, monkeypatch
    ):
        """SER_TPU_SKIP_EXISTING=1: a second run only recomputes missing
        outputs; surviving files are untouched and byte-stable."""
        from transformers import AutoConfig

        from interspeech_ser_tpu.extract.pipeline import SpeechExtractionPipeline
        from interspeech_ser_tpu.models.convert_hf import speech_hf_to_flax
        from interspeech_ser_tpu.models.speech import SpeechConfig, SpeechEncoderModel

        model_dir, hf_model = hf_wavlm_dir
        cfg = SpeechConfig.from_hf(AutoConfig.from_pretrained(model_dir))
        model = SpeechEncoderModel(cfg)
        params = speech_hf_to_flax(
            {k: v.numpy() for k, v in hf_model.state_dict().items()}, cfg
        )
        save = str(tmp_path / "resume")
        pipe = SpeechExtractionPipeline(model, params, cfg, n_devices=1)
        s1 = pipe.run(wav_dir, save)
        outs = sorted(os.listdir(save))
        assert s1.n_skipped == 0 and len(outs) == s1.n_utts
        ref = {
            f: torch.load(os.path.join(save, f), weights_only=True).numpy()
            for f in outs
        }
        os.remove(os.path.join(save, outs[0]))
        monkeypatch.setenv("SER_TPU_SKIP_EXISTING", "1")
        s2 = pipe.run(wav_dir, save)
        assert s2.n_skipped == len(outs) - 1 and s2.n_utts == 1
        for f in outs:
            got = torch.load(os.path.join(save, f), weights_only=True).numpy()
            np.testing.assert_allclose(got, ref[f], atol=2e-6)
        # default (no env): everything recomputes, nothing skipped
        monkeypatch.delenv("SER_TPU_SKIP_EXISTING")
        s3 = pipe.run(wav_dir, save)
        assert s3.n_skipped == 0 and s3.n_utts == len(outs)


class TestFrontendEnvOptIn:
    def test_env_sets_fused_depth_and_matches(
        self, wav_dir, hf_wavlm_dir, tmp_path, monkeypatch
    ):
        """SER_TPU_FRONTEND=2 flips the pipeline's model to the fused
        conv-prefix kernel (dp-only); .pt outputs must equal the XLA
        frontend path."""
        from transformers import AutoConfig

        from interspeech_ser_tpu.extract.pipeline import SpeechExtractionPipeline
        from interspeech_ser_tpu.models.convert_hf import speech_hf_to_flax
        from interspeech_ser_tpu.models.speech import SpeechConfig, SpeechEncoderModel

        model_dir, hf_model = hf_wavlm_dir
        cfg = SpeechConfig.from_hf(AutoConfig.from_pretrained(model_dir))
        model = SpeechEncoderModel(cfg)
        params = speech_hf_to_flax(
            {k: v.numpy() for k, v in hf_model.state_dict().items()}, cfg
        )
        save_a, save_b = str(tmp_path / "xla"), str(tmp_path / "fusedfe")
        SpeechExtractionPipeline(model, params, cfg, n_devices=1).run(wav_dir, save_a)
        monkeypatch.setenv("SER_TPU_FRONTEND", "2")
        pipe = SpeechExtractionPipeline(model, params, cfg, n_devices=1)
        assert pipe.model.fused_frontend == 2
        pipe.run(wav_dir, save_b)
        # 'xla' must force the kernel OFF even on a model built fused
        monkeypatch.setenv("SER_TPU_FRONTEND", "xla")
        fused_built = SpeechEncoderModel(cfg, fused_frontend=2)
        assert (
            SpeechExtractionPipeline(fused_built, params, cfg, n_devices=1)
            .model.fused_frontend
            == 0
        )
        for f in sorted(os.listdir(save_a)):
            a = torch.load(os.path.join(save_a, f), weights_only=True).numpy()
            b = torch.load(os.path.join(save_b, f), weights_only=True).numpy()
            np.testing.assert_allclose(b, a, atol=2e-4)
