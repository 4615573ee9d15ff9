"""LoRA transform: merge math vs torch, peft-name parsing, fine-tune e2e."""

import os
import sys
import wave as wave_mod

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.models import lora as lora_lib

RNG = np.random.default_rng(12)


class TestLoRAMath:
    def test_merge_matches_peft_formula(self):
        """peft: W' = W + (α/r)·B@A (torch [out,in]); ours in flax layout."""
        W = RNG.normal(size=(24, 32)).astype(np.float32)  # flax [in, out]
        A = RNG.normal(size=(24, 4)).astype(np.float32)  # [in, r]
        B = RNG.normal(size=(4, 32)).astype(np.float32)  # [r, out]
        params = {"layer0": {"attention": {"q_proj": {"kernel": jnp.asarray(W)}}}}
        lora = {"layer0": {"attention": {"q_proj": {"kernel": {"lora_A": A, "lora_B": B}}}}}
        merged = lora_lib.merge_lora(params, lora, alpha=16, rank=4)
        # torch orientation: W_t' = W_t + (16/4)·(B_t @ A_t)
        W_t = torch.tensor(W.T)
        A_t = torch.tensor(A.T)  # [r, in]
        B_t = torch.tensor(B.T)  # [out, r]
        ref = W_t + 4.0 * (B_t @ A_t)
        np.testing.assert_allclose(
            np.asarray(merged["layer0"]["attention"]["q_proj"]["kernel"]).T,
            ref.numpy(), atol=1e-5,
        )

    def test_zero_B_is_identity(self):
        W = RNG.normal(size=(8, 8)).astype(np.float32)
        params = {"d": {"q_proj": {"kernel": jnp.asarray(W)}}}
        lora = lora_lib.init_lora(jax.random.PRNGKey(0), params, rank=2)
        merged = lora_lib.merge_lora(params, lora, alpha=16, rank=2)
        np.testing.assert_array_equal(np.asarray(merged["d"]["q_proj"]["kernel"]), W)

    def test_state_dict_roundtrip(self):
        params = {
            "layer0": {"attention": {"q_proj": {"kernel": jnp.zeros((6, 6))},
                                      "v_proj": {"kernel": jnp.zeros((6, 6))}}}
        }
        lora = lora_lib.init_lora(jax.random.PRNGKey(1), params, rank=3)
        sd = lora_lib.lora_state_dict(lora)
        assert len(sd) == 4  # 2 targets × (A, B)
        back = lora_lib.lora_from_state_dict(sd)
        a1 = back["layer0"]["attention"]["q_proj"]["kernel"]["lora_A"]
        a0 = np.asarray(lora["layer0"]["attention"]["q_proj"]["kernel"]["lora_A"])
        np.testing.assert_array_equal(a1, a0)

    def test_peft_name_parsing(self):
        A = RNG.normal(size=(4, 16)).astype(np.float32)  # torch [r, in]
        B = RNG.normal(size=(16, 4)).astype(np.float32)  # torch [out, r]
        sd = {
            "wavlm.base_model.model.encoder.layers.3.attention.q_proj.lora_A.default.weight": A,
            "wavlm.base_model.model.encoder.layers.3.attention.q_proj.lora_B.default.weight": B,
        }
        lora = lora_lib.lora_from_peft_state_dict(sd)
        node = lora["layer3"]["attention"]["q_proj"]["kernel"]
        np.testing.assert_array_equal(node["lora_A"], A.T)
        np.testing.assert_array_equal(node["lora_B"], B.T)

    def test_ffn_target_matcher(self):
        assert lora_lib.match_ffn_dense(("layer0", "feed_forward", "intermediate_dense", "kernel"))
        assert not lora_lib.match_ffn_dense(("layer0", "attention", "q_proj", "kernel"))


def _write_wav(path, samples, sr=16000):
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    from transformers import WavLMConfig, WavLMModel

    root = tmp_path_factory.mktemp("lora")
    torch.manual_seed(6)
    cfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=32, max_bucket_distance=64, do_stable_layer_norm=True,
        feat_extract_norm="layer", conv_bias=True, layerdrop=0.0,
    )
    WavLMModel(cfg).save_pretrained(str(root / "hf"))
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    wavs, labels = [], []
    for i in range(16):
        cls = i % 2
        w = 0.3 * np.sin(np.arange(3200 + 320 * i) * (0.05 + 0.1 * cls))
        wavs.append(w.astype(np.float32))
        labels.append(cls)
        _write_wav(str(wav_dir / f"u{i:02d}.wav"), w)
    return root, wavs, np.asarray(labels)


class TestLoRAFineTune:
    def test_train_updates_only_lora_and_head(self, tiny_setup):
        from interspeech_ser_tpu.train.lora_engine import LoRAFTEngine

        root, wavs, labels = tiny_setup
        engine = LoRAFTEngine(str(root / "hf"), rank=2, num_emotions=2)
        base_before = jax.tree.map(np.asarray, engine.base_params)
        res = engine.train_epochs(
            wavs[:12], labels[:12], wavs[12:], labels[12:],
            epochs=2, batch_size=4, lr=5e-3,
        )
        assert len(res["history"]) == 2
        # base untouched
        base_after = jax.tree.map(np.asarray, engine.base_params)
        for a, b in zip(jax.tree.leaves(base_before), jax.tree.leaves(base_after)):
            np.testing.assert_array_equal(a, b)
        # lora B no longer zero
        b_leaf = jax.tree.leaves(
            engine.lora["layer0"]["attention"]["q_proj"]["kernel"]["lora_B"]
        )[0]
        assert float(np.abs(np.asarray(b_leaf)).max()) > 0

    def test_checkpoint_roundtrip_and_merged_backbone(self, tiny_setup, tmp_path):
        from interspeech_ser_tpu.train.lora_engine import LoRAFTEngine

        root, wavs, labels = tiny_setup
        engine = LoRAFTEngine(str(root / "hf"), rank=2, num_emotions=2)
        engine.train_epochs(
            wavs[:8], labels[:8], wavs[8:], labels[8:], epochs=1, batch_size=4, lr=5e-3
        )
        p = str(tmp_path / "whisper_lora_ser.pt")
        engine.save(p)
        engine2 = LoRAFTEngine(str(root / "hf"), rank=2, num_emotions=2)
        engine2.load(p)
        pred1 = engine.predict(wavs[:4])
        pred2 = engine2.predict(wavs[:4])
        np.testing.assert_array_equal(pred1, pred2)
        merged = engine2.merged_backbone_params()
        assert "layer0" in merged

    def test_pretrained_extraction_cli(self, tiny_setup, tmp_path):
        from interspeech_ser_tpu.preprocess_cli import speech_pretrained_main
        from interspeech_ser_tpu.train.lora_engine import LoRAFTEngine

        root, wavs, labels = tiny_setup
        engine = LoRAFTEngine(str(root / "hf"), rank=2, num_emotions=2)
        ckpt = str(tmp_path / "lora.pt")
        engine.save(ckpt)
        save = str(tmp_path / "feats")
        stats = speech_pretrained_main(
            ["--ssl_type", str(root / "hf"), "--wav_dir", str(root / "wavs"),
             "--save_path", save, "--lora_ckpt", ckpt, "--lora_rank", "2"]
        )
        assert stats.n_utts == 16
        arr = torch.load(os.path.join(save, "u00.pt"), weights_only=True)
        assert arr.shape[-1] == 32


class TestWhisperLoRAFineTune:
    """Whisper dirs dispatch to the encoder-only whisper stack (reference
    fine-tunes whisper with the same peft q/v LoRA —
    preprocessing/preprocess_whisper_pretrained.py:117-169)."""

    @pytest.fixture(scope="class")
    def whisper_setup(self, tmp_path_factory):
        from transformers import WhisperConfig, WhisperModel

        root = tmp_path_factory.mktemp("lorawhisper")
        torch.manual_seed(9)
        hf_cfg = WhisperConfig(
            num_mel_bins=16, d_model=32, encoder_layers=2,
            encoder_attention_heads=4, encoder_ffn_dim=64, decoder_layers=1,
            decoder_attention_heads=4, decoder_ffn_dim=64,
            max_source_positions=1500,
        )
        WhisperModel(hf_cfg).encoder.save_pretrained(str(root / "hf"))
        wav_dir = root / "wavs"
        wav_dir.mkdir()
        wavs, labels = [], []
        for i in range(8):
            cls = i % 2
            w = 0.3 * np.sin(np.arange(3200 + 320 * i) * (0.05 + 0.1 * cls))
            wavs.append(w.astype(np.float32))
            labels.append(cls)
            _write_wav(str(wav_dir / f"u{i:02d}.wav"), w)
        return root, wavs, np.asarray(labels)

    def test_train_and_ckpt_feeds_pretrained_extraction(self, whisper_setup, tmp_path):
        from interspeech_ser_tpu.preprocess_cli import whisper_pretrained_main
        from interspeech_ser_tpu.train.lora_engine import LoRAFTEngine

        root, wavs, labels = whisper_setup
        engine = LoRAFTEngine(str(root / "hf"), rank=2, num_emotions=2)
        assert engine.is_whisper and engine.cfg.train_kernels
        base_before = jax.tree.map(np.asarray, engine.base_params)
        res = engine.train_epochs(
            wavs[:6], labels[:6], wavs[6:], labels[6:],
            epochs=1, batch_size=3, lr=5e-3,
        )
        assert len(res["history"]) == 1
        for a, b in zip(
            jax.tree.leaves(base_before),
            jax.tree.leaves(jax.tree.map(np.asarray, engine.base_params)),
        ):
            np.testing.assert_array_equal(a, b)
        b_leaf = jax.tree.leaves(
            engine.lora["layer0"]["self_attn"]["q_proj"]["kernel"]["lora_B"]
        )[0]
        assert float(np.abs(np.asarray(b_leaf)).max()) > 0

        # checkpoint roundtrip + the *_pretrained extraction CLI chain
        ckpt = str(tmp_path / "whisper_lora_ser.pt")
        engine.save(ckpt)
        engine2 = LoRAFTEngine(str(root / "hf"), rank=2, num_emotions=2)
        engine2.load(ckpt)
        np.testing.assert_array_equal(
            engine.predict(wavs[:3], batch_size=3),
            engine2.predict(wavs[:3], batch_size=3),
        )
        save = str(tmp_path / "feats")
        stats = whisper_pretrained_main(
            ["--ssl_type", str(root / "hf"), "--wav_dir", str(root / "wavs"),
             "--save_path", save, "--lora_ckpt", ckpt, "--lora_rank", "2",
             "--lora_alpha", "16"]
        )
        assert stats.n_utts == 8
        arr = torch.load(os.path.join(save, "u00.pt"), weights_only=True)
        assert arr.shape[-1] == 32

    def test_ffn_target_rejected_for_whisper(self, whisper_setup):
        from interspeech_ser_tpu.train.lora_engine import LoRAFTEngine

        root, _, _ = whisper_setup
        with pytest.raises(ValueError, match="ffn"):
            LoRAFTEngine(str(root / "hf"), rank=2, target="ffn", num_emotions=2)


class TestNonLoraFinetuneMethods:
    """adapter / adapter_l / embedding_prompt / combined
    (reference lora_wavlm/model.py:37-50; Adapter spec in models/speech.py —
    the reference's own Adapter class is an unbound name)."""

    def _base(self, method):
        from interspeech_ser_tpu.models import lora as lora_lib
        from interspeech_ser_tpu.models.speech import SpeechConfig, SpeechEncoderModel

        cfg = SpeechConfig(
            hidden_size=48, num_layers=2, num_heads=4, intermediate_size=96,
            conv_dim=(24,) * 3, conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
            attention_type="wavlm",
        )
        base_model = SpeechEncoderModel(cfg)
        wav = jnp.asarray(RNG.normal(size=(2, 1600)).astype(np.float32))
        mask = jnp.ones((2, 1600), jnp.float32)
        base_params = base_model.init(jax.random.PRNGKey(0), wav, mask)["params"]

        import dataclasses
        ft_cfg = dataclasses.replace(cfg, finetune_method=method,
                                     adapter_hidden_dim=16,
                                     embedding_prompt_dim=3)
        ft_model = SpeechEncoderModel(ft_cfg)
        full = lora_lib.add_finetune_params(
            jax.random.PRNGKey(1), ft_model, base_params, probe_len=1600
        )
        return base_model, base_params, ft_model, full, wav, mask

    def test_adapter_identity_at_init(self):
        for method in ("adapter", "adapter_l"):
            base_model, base_params, ft_model, full, wav, mask = self._base(method)
            ref = base_model.apply({"params": base_params}, wav, mask)["last_hidden_state"]
            out = ft_model.apply({"params": full}, wav, mask)["last_hidden_state"]
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-6,
                err_msg=f"{method} must start at the pretrained function",
            )

    def test_prompt_changes_output_but_keeps_shape(self):
        base_model, base_params, ft_model, full, wav, mask = self._base("embedding_prompt")
        ref = base_model.apply({"params": base_params}, wav, mask)["last_hidden_state"]
        out = ft_model.apply({"params": full}, wav, mask)["last_hidden_state"]
        assert out.shape == ref.shape  # prompts stripped per layer
        assert float(jnp.max(jnp.abs(out - ref))) > 1e-6

    def test_combined_has_prompt_and_adapter(self):
        _, _, ft_model, full, wav, mask = self._base("combined")
        assert "adapter" in full["layer0"] and "embed_prompt" in full["layer0"]
        out = ft_model.apply({"params": full}, wav, mask)["last_hidden_state"]
        assert np.isfinite(np.asarray(out)).all()

    def test_split_merge_roundtrip_and_grads(self):
        from interspeech_ser_tpu.models import lora as lora_lib

        _, _, ft_model, full, wav, mask = self._base("adapter_l")
        base, tuned = lora_lib.split_finetune_params(full)
        assert "adapter" not in base["layer0"]
        merged = lora_lib.merge_finetune_params(base, tuned)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            full, merged,
        )

        def loss(tuned):
            p = lora_lib.merge_finetune_params(base, tuned)
            out = ft_model.apply({"params": p}, wav, mask)["last_hidden_state"]
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(tuned)
        gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        assert np.isfinite(gsum) and gsum > 0


class TestLoRADataParallel:
    """LoRAFTEngine rides the mesh: predict must be identical on a
    1-device vs 8-device mesh (deterministic forward; rows padded to a
    mesh multiple), and training must run data-parallel end-to-end."""

    def test_predict_dp_matches_single_device(self, tiny_setup):
        from interspeech_ser_tpu.train.lora_engine import LoRAFTEngine

        root, wavs, labels = tiny_setup
        e1 = LoRAFTEngine(str(root / "hf"), rank=2, num_emotions=2, n_devices=1)
        e8 = LoRAFTEngine(str(root / "hf"), rank=2, num_emotions=2, n_devices=8)
        # same seed → same init; predict is deterministic
        p1 = e1.predict(wavs[:10], batch_size=4)
        p8 = e8.predict(wavs[:10], batch_size=4)
        np.testing.assert_array_equal(p1, p8)

    def test_train_epochs_on_mesh(self, tiny_setup):
        from interspeech_ser_tpu.train.lora_engine import LoRAFTEngine

        root, wavs, labels = tiny_setup
        engine = LoRAFTEngine(str(root / "hf"), rank=2, num_emotions=2, n_devices=8)
        res = engine.train_epochs(
            wavs[:12], labels[:12], wavs[12:], labels[12:],
            epochs=1, batch_size=4, lr=5e-3,
        )
        assert len(res["history"]) == 1
        # lora B updated and finite on the 8-device mesh
        b_leaf = jax.tree.leaves(
            engine.lora["layer0"]["attention"]["q_proj"]["kernel"]["lora_B"]
        )[0]
        arr = np.asarray(b_leaf)
        assert np.all(np.isfinite(arr)) and float(np.abs(arr).max()) > 0
