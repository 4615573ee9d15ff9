"""Joint roberta+wavlm family: head parity vs torch, converters, e2e CLIs.

Reference scripts: /root/reference/bin/old/train_cat_roberta*.py.
"""

import json
import os
import sys
import wave as wave_mod

import numpy as np
import pandas as pd
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.models.joint import (
    ConvJointHead,
    TorchTransformerEncoderLayer,
    TransformerJointHead,
    conv_joint_flax_to_torch,
    conv_joint_torch_to_flax,
    transformer_joint_flax_to_torch,
    transformer_joint_torch_to_flax,
)

RNG = np.random.default_rng(3)


class TorchConvJoint(nn.Module):
    """Reference MultimodalSERClassifier (train_cat_roberta_wavlm.py:217-273)."""

    def __init__(self, wav_dim, rob_dim, h, ln=True, p=0.5):
        super().__init__()
        self.wav_conv1 = nn.Conv1d(wav_dim, h, 3, padding=1)
        self.wav_conv2 = nn.Conv1d(h, h, 3, padding=1)
        self.rob_conv1 = nn.Conv1d(rob_dim, h, 3, padding=1)
        self.rob_conv2 = nn.Conv1d(h, h, 3, padding=1)
        self.pool = nn.AdaptiveMaxPool1d(1)
        layers = [nn.Linear(2 * h, h)]
        if ln:
            layers.append(nn.LayerNorm(h))
        layers += [nn.ReLU(), nn.Dropout(0.2), nn.Linear(h, 8)]
        self.classifier = nn.Sequential(*layers)

    def forward(self, wav, rob):
        def branch(x, c1, c2):
            x = x.transpose(1, 2)
            x = torch.relu(c1(x))
            x = torch.relu(c2(x))
            return self.pool(x).squeeze(-1)

        w = branch(wav, self.wav_conv1, self.wav_conv2)
        r = branch(rob, self.rob_conv1, self.rob_conv2)
        return self.classifier(torch.cat([w, r], dim=1))


class TestConvJointHead:
    def test_matches_torch_reference(self):
        Dw, Dr, H = 12, 10, 16
        torch_model = TorchConvJoint(Dw, Dr, H).eval()
        sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
        params = conv_joint_torch_to_flax(sd, classifier_layernorm=True)

        model = ConvJointHead(Dw, Dr, H, input_dropout=True, masked=False)
        wav = RNG.normal(size=(3, 20, Dw)).astype(np.float32)
        rob = RNG.normal(size=(3, 7, Dr)).astype(np.float32)
        ours = np.asarray(
            model.apply({"params": params}, jnp.asarray(wav), jnp.asarray(rob))
        )
        with torch.no_grad():
            ref = torch_model(torch.tensor(wav), torch.tensor(rob)).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_converter_roundtrip(self):
        model = ConvJointHead(6, 5, 8, classifier_layernorm=False, input_dropout=False)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, 6)), jnp.zeros((1, 3, 5)),
        )["params"]
        back = conv_joint_torch_to_flax(
            conv_joint_flax_to_torch(params, False), False
        )
        np.testing.assert_array_equal(
            back["wav_conv1"]["kernel"], np.asarray(params["wav_conv1"]["kernel"])
        )
        np.testing.assert_array_equal(
            back["cls_out"]["kernel"], np.asarray(params["cls_out"]["kernel"])
        )

    def test_masked_eval_equals_batch1(self):
        """Batched masked forward == per-sample unpadded forwards."""
        Dw, Dr, H = 8, 6, 8
        model = ConvJointHead(Dw, Dr, H, masked=True)
        tw, tr = [9, 5], [4, 7]
        wavs = [RNG.normal(size=(t, Dw)).astype(np.float32) for t in tw]
        robs = [RNG.normal(size=(t, Dr)).astype(np.float32) for t in tr]
        params = model.init(
            jax.random.PRNGKey(1), jnp.asarray(wavs[0][None]), jnp.asarray(robs[0][None])
        )["params"]

        # batched padded
        W, R = max(tw), max(tr)
        wav = np.zeros((2, W, Dw), np.float32)
        rob = np.zeros((2, R, Dr), np.float32)
        wm = np.zeros((2, W), np.float32)
        rm = np.zeros((2, R), np.float32)
        for i in range(2):
            wav[i, : tw[i]] = wavs[i]
            rob[i, : tr[i]] = robs[i]
            wm[i, : tw[i]] = 1
            rm[i, : tr[i]] = 1
        batched = np.asarray(
            model.apply(
                {"params": params}, jnp.asarray(wav), jnp.asarray(rob),
                jnp.asarray(wm), jnp.asarray(rm),
            )
        )
        for i in range(2):
            single = np.asarray(
                model.apply(
                    {"params": params},
                    jnp.asarray(wavs[i][None]), jnp.asarray(robs[i][None]),
                )
            )[0]
            # conv k=3 sees 1 padded frame at the boundary; max-pool excludes
            # pad rows, boundary effect only in last valid frame's receptive
            # field — identical when we compare against padded-to-same-length
            np.testing.assert_allclose(batched[i], single, atol=1e-4)


class TestTorchTransformerEncoderLayer:
    def test_matches_torch(self):
        D, FF = 16, 64
        ref = nn.TransformerEncoderLayer(
            d_model=D, nhead=1, dim_feedforward=FF, dropout=0.5, batch_first=True
        ).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        from interspeech_ser_tpu.models.joint import _tel_torch_to_flax

        params = _tel_torch_to_flax({f"l.{k}": v for k, v in sd.items()}, "l")
        model = TorchTransformerEncoderLayer(D, 1, FF, dropout=0.5)
        x = RNG.normal(size=(2, 9, D)).astype(np.float32)
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            out = ref(torch.tensor(x)).numpy()
        np.testing.assert_allclose(ours, out, atol=3e-5)


class TestTransformerJointHead:
    def test_gated_shapes_and_roundtrip(self):
        Dw, Dr, H = 10, 8, 12
        model = TransformerJointHead(Dw, Dr, H, gated=True)
        wav = jnp.asarray(RNG.normal(size=(2, 6, Dw)).astype(np.float32))
        rob = jnp.asarray(RNG.normal(size=(2, 4, Dr)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(2), wav, rob)["params"]
        logits, wx, rx = model.apply({"params": params}, wav, rob)
        assert logits.shape == (2, 8) and wx.shape == (2, H) and rx.shape == (2, H)
        back = transformer_joint_torch_to_flax(
            transformer_joint_flax_to_torch(params, gated=True), gated=True
        )
        np.testing.assert_array_equal(
            back["wav_transformer_0"]["linear1"]["kernel"],
            np.asarray(params["wav_transformer_0"]["linear1"]["kernel"]),
        )
        np.testing.assert_array_equal(
            back["wav_gate"]["kernel"], np.asarray(params["wav_gate"]["kernel"])
        )


def _write_wav(path, x):
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())


def _dummy_tokenize(texts, max_length=12):
    ids = np.ones((len(texts), max_length), np.int64)  # pad id 1
    mask = np.zeros((len(texts), max_length), np.int64)
    for i, t in enumerate(texts):
        toks = [2] + [3 + (hash(w) % 40) for w in str(t).split()][: max_length - 2] + [2]
        ids[i, : len(toks)] = toks
        mask[i, : len(toks)] = 1
    return {"input_ids": ids, "attention_mask": mask}


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    from transformers import RobertaConfig as HFRobertaConfig
    from transformers import RobertaModel as HFRobertaModel
    from transformers import WavLMConfig, WavLMModel

    root = tmp_path_factory.mktemp("jointdata")
    wav_dir = root / "audio"
    wav_dir.mkdir()
    rows, texts = [], []
    for i in range(20):
        cls = i % 8
        split = "Train" if i < 14 else "Development"
        name = f"MSP-PODCAST_{i:03d}.wav"
        tone = np.sin(np.arange(3500 + 160 * i) * (0.04 + 0.02 * cls))
        _write_wav(str(wav_dir / name), 0.3 * tone)
        onehot = [0.0] * 8
        onehot[cls] = 1.0
        rows.append([name] + onehot + [split])
        texts.append([name, f"sample text {cls} " * (cls + 1)])
    from interspeech_ser_tpu.utils.labels import CLASSES

    pd.DataFrame(rows, columns=["FileName"] + CLASSES + ["Split_Set"]).to_csv(
        root / "labels.csv", index=False
    )
    pd.DataFrame(texts, columns=["FileName", "transcription"]).to_csv(
        root / "transcripts.csv", index=False
    )

    torch.manual_seed(4)
    WavLMModel(
        WavLMConfig(
            hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=48, conv_dim=[12, 12], conv_kernel=[10, 3],
            conv_stride=[5, 2], num_feat_extract_layers=2,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            num_buckets=32, max_bucket_distance=64, do_stable_layer_norm=True,
            feat_extract_norm="layer", conv_bias=True, layerdrop=0.0,
        )
    ).save_pretrained(str(root / "hf_wavlm"))
    HFRobertaModel(
        HFRobertaConfig(
            vocab_size=64, hidden_size=16, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        )
    ).save_pretrained(str(root / "hf_roberta"))

    def make_config(model_path, extra=None):
        cfg = {
            "wav_dir": str(wav_dir),
            "txt_dir": str(root / "transcripts.csv"),
            "label_path": str(root / "labels.csv"),
            "ssl_type": str(root / "hf_wavlm"),
            "text_type": str(root / "hf_roberta"),
            "batch_size": 4,
            "accum_step": 2,
            "epochs": 2,
            "lr": 1e-3,
            "model_path": str(root / model_path),
            "head_dim": 8,
            "pooling_type": "none",
            "weight_decay": 1e-6,
            "dropout_head": 0.5,
            "use_timbre_perturb": False,
            "tp_prob": 0.0,
        }
        cfg.update(extra or {})
        p = root / f"config_{model_path}.json"
        with open(p, "w") as f:
            json.dump(cfg, f)
        return str(p)

    return root, make_config


class TestJointEngineE2E:
    def _run(self, fixture, variant, model_dir, extra=None):
        from interspeech_ser_tpu.joint_cli import train_main

        root, make_config = fixture
        cfg = make_config(model_dir, extra)
        best = train_main(
            variant, argv=["--config_path", cfg, "--seed", "3"],
            tokenize=_dummy_tokenize,
        )
        assert best["epoch"] >= 0
        assert os.path.exists(str(root / model_dir / "final_ser.pt"))
        return root / model_dir

    def test_base_variant(self, fixture):
        out = self._run(fixture, "base", "m_base")
        sd = torch.load(str(out / "final_ser.pt"), weights_only=True)
        # reference state_dict names (MultimodalSERClassifier)
        assert "wav_conv1.weight" in sd and "classifier.1.weight" in sd
        ref = TorchConvJoint(24, 16, 8, ln=True)
        missing, unexpected = ref.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}, strict=True
        )
        assert not missing and not unexpected

    def test_ftall_variant(self, fixture):
        out = self._run(fixture, "ftall", "m_ftall")
        for f in ("final_ser.pt", "final_ssl.pt", "final_text_model.pt"):
            assert os.path.exists(str(out / f)), f
        # text model round-trips into HF roberta
        from transformers import RobertaModel as HFRobertaModel

        root, _ = fixture
        hf = HFRobertaModel.from_pretrained(str(root / "hf_roberta"))
        sd = torch.load(str(out / "final_text_model.pt"), weights_only=True)
        missing, unexpected = hf.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}, strict=False
        )
        assert not unexpected
        assert all("pooler" in m for m in missing)

    def test_cka_variant(self, fixture):
        out = self._run(fixture, "cka", "m_cka", {"use_balanced_batch": True})
        sd = torch.load(str(out / "final_ser.pt"), weights_only=True)
        assert "wav_gate.0.weight" in sd
        assert "wav_transformer.layers.1.self_attn.in_proj_weight" in sd

    def test_large_variant(self, fixture):
        out = self._run(fixture, "large", "m_large")
        sd = torch.load(str(out / "final_ser.pt"), weights_only=True)
        assert "wav_proj.weight" in sd and "classifier.3.weight" in sd
        assert "wav_gate.0.weight" not in sd

    def test_text_only(self, fixture):
        from interspeech_ser_tpu.joint_cli import train_text_main

        root, make_config = fixture
        cfg = make_config("m_text", {"use_focalloss": True})
        best = train_text_main(
            argv=["--config_path", cfg, "--seed", "3"], tokenize=_dummy_tokenize
        )
        assert best["epoch"] >= 0
        sd = torch.load(str(root / "m_text" / "text_ser.pt"), weights_only=True)
        assert "roberta.embeddings.word_embeddings.weight" in sd
        assert "classifier.out_proj.weight" in sd
