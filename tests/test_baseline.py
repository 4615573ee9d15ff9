"""Challenge-baseline subsystem: pooling/head parity, checkpoints, e2e CLI."""

import json
import os
import sys
import wave as wave_mod

import numpy as np
import pandas as pd
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.baseline import data as bdata
from interspeech_ser_tpu.baseline import podcast
from interspeech_ser_tpu.baseline.models import (
    AttentiveStatisticsPooling,
    EmotionRegression,
    pooling_flax_to_torch,
    pooling_torch_to_flax,
    ser_flax_to_torch,
    ser_torch_to_flax,
)

RNG = np.random.default_rng(11)


class TestAttentiveStatisticsPooling:
    def _torch_reference(self, xs, feat_lens, W, b, attention):
        """Reference math: per-sample loop (benchmark/net/pooling.py:48-59)."""
        outs = []
        for x, fl in zip(xs, feat_lens):
            x = torch.tensor(x[:fl])[None]
            h = torch.tanh(x @ torch.tensor(W).T + torch.tensor(b))
            w = (h @ torch.tensor(attention)).squeeze(2)
            w = F.softmax(w, dim=1).view(1, -1, 1)
            mu = torch.sum(x * w, dim=1)
            rh = torch.sqrt((torch.sum((x ** 2) * w, dim=1) - mu ** 2).clamp(min=1e-5))
            outs.append(torch.cat((mu, rh), 1).squeeze(0))
        return torch.stack(outs).numpy()

    def test_matches_reference_loop(self):
        B, T, D = 3, 40, 16
        xs = RNG.normal(size=(B, T, D)).astype(np.float32)
        wav_lens = [12800, 7777, 3210]  # frame lens: (l-1)//320+1
        L = max(wav_lens)
        mask = np.zeros((B, L), np.float32)
        for i, l in enumerate(wav_lens):
            mask[i, :l] = 1
        feat_lens = [min((l - 1) // 320 + 1, T) for l in wav_lens]

        model = AttentiveStatisticsPooling(D)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(xs), jnp.asarray(mask))["params"]
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(xs), jnp.asarray(mask)))
        W = np.asarray(params["sap_linear"]["kernel"]).T
        b = np.asarray(params["sap_linear"]["bias"])
        att = np.asarray(params["attention"])
        ref = self._torch_reference(xs, feat_lens, W, b, att)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_converter_roundtrip(self):
        model = AttentiveStatisticsPooling(8)
        params = model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 4, 8)), jnp.ones((1, 1280))
        )["params"]
        back = pooling_torch_to_flax(pooling_flax_to_torch(params))
        for k in ("sap_linear",):
            np.testing.assert_array_equal(back[k]["kernel"], np.asarray(params[k]["kernel"]))


class TestEmotionRegression:
    def test_matches_torch_reference(self):
        torch.manual_seed(7)
        D, H, O = 16, 12, 8
        fc0 = torch.nn.Sequential(
            torch.nn.Linear(D, H), torch.nn.LayerNorm(H), torch.nn.ReLU(), torch.nn.Dropout(0.5)
        )
        out = torch.nn.Sequential(torch.nn.Linear(H, O))
        fc0.eval(), out.eval()
        sd = {
            "fc.0.0.weight": fc0[0].weight.detach().numpy(),
            "fc.0.0.bias": fc0[0].bias.detach().numpy(),
            "fc.0.1.weight": fc0[1].weight.detach().numpy(),
            "fc.0.1.bias": fc0[1].bias.detach().numpy(),
            "out.0.weight": out[0].weight.detach().numpy(),
            "out.0.bias": out[0].bias.detach().numpy(),
        }
        x = RNG.normal(size=(5, D)).astype(np.float32)
        with torch.no_grad():
            ref = out(fc0(torch.tensor(x))).numpy()
        model = EmotionRegression(D, H, 1, O)
        params = ser_torch_to_flax(sd, 1)
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=2e-5)
        # roundtrip
        back = ser_flax_to_torch(params, 1)
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k])


class TestNormStats:
    def test_streaming_stats_and_pickle(self, tmp_path):
        wavs = [RNG.normal(size=n).astype(np.float32) for n in (100, 300, 77)]
        mean, std = bdata.get_norm_stat_for_wav(wavs)
        allw = np.concatenate(wavs)
        np.testing.assert_allclose(mean, allw.mean(), rtol=1e-5)
        np.testing.assert_allclose(std, allw.std(), rtol=1e-4)
        p = str(tmp_path / "train_norm_stat.pkl")
        bdata.save_norm_stat(p, mean, std)
        # byte-compatible with the reference's consumer
        import pickle

        with open(p, "rb") as f:
            m2, s2 = pickle.load(f)
        assert (m2, s2) == (mean, std)

    def test_reads_reference_shipped_pickle(self):
        ref_pkl = "/root/reference/benchmark/model/cat_ser/7/train_norm_stat.pkl"
        if not os.path.exists(ref_pkl):
            pytest.skip("reference pickle not present")
        mean, std = bdata.load_norm_stat(ref_pkl)
        assert np.isfinite(mean) and np.isfinite(std) and std > 0


class TestPodcastLoaders:
    def test_loaders(self, tmp_path):
        df = pd.DataFrame(
            {
                "FileName": [f"u{i}.wav" for i in range(6)],
                "Angry": [1, 0, 0, 1, 0, 0],
                "Sad": [0, 1, 0, 0, 0, 0],
                "Happy": [0, 0, 1, 0, 0, 0],
                "Surprise": 0, "Fear": 0, "Disgust": 0, "Contempt": 0,
                "Neutral": [0, 0, 0, 0, 1, 1],
                "EmoAct": 0.5, "EmoDom": 0.4, "EmoVal": 0.3,
                "SpkrID": ["10", "20", "Unknown", "10", "30", "20"],
                "Split_Set": ["Train", "Train", "Train", "Development", "Train", "Train"],
            }
        )
        p = str(tmp_path / "labels.csv")
        df.to_csv(p, index=False)
        utts, labs = podcast.load_cat_emo_label(p, "train")
        assert len(utts) == 5 and labs.shape == (5, 8)
        utts, labs = podcast.load_adv_emo_label(p, "dev")
        assert len(utts) == 1 and labs.shape == (1, 3)
        utts, spk, n = podcast.load_spk_id(p, "train")
        assert len(utts) == 4 and n == 3 and set(spk) == {0, 1, 2}


def _write_wav(path, samples, sr=16000):
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


class TestBaselineEndToEnd:
    @pytest.fixture(scope="class")
    def fixture(self, tmp_path_factory):
        from transformers import WavLMConfig, WavLMModel

        root = tmp_path_factory.mktemp("baseline")
        wav_dir = root / "audios"
        wav_dir.mkdir()
        rows = []
        for i in range(20):
            cls = i % 8
            split = "Train" if i < 12 else "Development"
            name = f"MSP-PODCAST_{i:03d}.wav"
            tone = np.sin(np.arange(4000 + 320 * i) * (0.05 + 0.02 * cls))
            _write_wav(str(wav_dir / name), 0.3 * tone)
            onehot = [0.0] * 8
            onehot[cls] = 1.0
            rows.append([name] + onehot + [0.5, 0.4, 0.3] + [split])
        for i in range(3):  # test3 wavs
            _write_wav(
                str(wav_dir / f"MSP-PODCAST_test3_{i}.wav"),
                0.2 * np.sin(np.arange(5000) * 0.1),
            )
        cols = ["FileName"] + podcast.CAT_COLUMNS + podcast.ADV_COLUMNS + ["Split_Set"]
        pd.DataFrame(rows, columns=cols).to_csv(root / "labels.csv", index=False)

        torch.manual_seed(5)
        hf_cfg = WavLMConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
            conv_stride=[5, 2], num_feat_extract_layers=2,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            num_buckets=32, max_bucket_distance=64, do_stable_layer_norm=True,
            feat_extract_norm="layer", conv_bias=True, layerdrop=0.0,
        )
        WavLMModel(hf_cfg).save_pretrained(str(root / "hf"))
        os.makedirs(root / "configs", exist_ok=True)
        with open(root / "configs" / "config_cat.json", "w") as f:
            json.dump({"wav_dir": str(wav_dir), "label_path": str(root / "labels.csv")}, f)
        return root

    def test_train_eval_cat(self, fixture):
        from interspeech_ser_tpu.baseline.cli import eval_main, train_main

        model_path = str(fixture / "model")
        cfg = str(fixture / "configs" / "config_cat.json")
        best = train_main(
            "cat",
            argv=["--ssl_type", str(fixture / "hf"), "--batch_size", "4",
                  "--accumulation_steps", "2", "--epochs", "2", "--lr", "1e-3",
                  "--head_dim", "16", "--model_path", model_path,
                  "--config_path", cfg],
        )
        assert best["epoch"] >= 0
        for f in ("final_ser.pt", "final_ssl.pt", "final_pool.pt", "train_norm_stat.pkl"):
            assert os.path.exists(os.path.join(model_path, f)), f

        # final_ssl.pt loads back into the HF torch model (interop contract)
        from transformers import WavLMModel

        hf = WavLMModel.from_pretrained(str(fixture / "hf"))
        sd = torch.load(os.path.join(model_path, "final_ssl.pt"), weights_only=True)
        missing, unexpected = hf.load_state_dict(sd, strict=False)
        assert not unexpected
        assert all("masked_spec_embed" in m or "parametrizations" in m for m in missing)

        out = eval_main(
            "cat", dev=True,
            argv=["--ssl_type", str(fixture / "hf"), "--head_dim", "16",
                  "--model_path", model_path, "--config_path", cfg],
        )
        dev = pd.read_csv(out)
        assert list(dev.columns) == ["FileName", "EmoClass"]

        out = eval_main(
            "cat", dev=False,
            argv=["--ssl_type", str(fixture / "hf"), "--head_dim", "16",
                  "--model_path", model_path, "--config_path", cfg],
        )
        test3 = pd.read_csv(out)
        assert len(test3) == 3
        assert (test3["FileName"].str.contains("test3")).all()

    def test_train_eval_dim(self, fixture):
        from interspeech_ser_tpu.baseline.cli import eval_main, train_main

        model_path = str(fixture / "model_dim")
        cfg = str(fixture / "configs" / "config_cat.json")
        train_main(
            "dim",
            argv=["--ssl_type", str(fixture / "hf"), "--batch_size", "4",
                  "--epochs", "1", "--lr", "1e-3", "--head_dim", "16",
                  "--model_path", model_path, "--config_path", cfg],
        )
        out = eval_main(
            "dim", dev=False,
            argv=["--ssl_type", str(fixture / "hf"), "--head_dim", "16",
                  "--model_path", model_path, "--config_path", cfg],
        )
        df = pd.read_csv(out)
        assert list(df.columns) == ["FileName", "EmoAct", "EmoVal", "EmoDom"]
        assert ((df[["EmoAct", "EmoVal", "EmoDom"]] >= 1).all().all())
        assert ((df[["EmoAct", "EmoVal", "EmoDom"]] <= 7).all().all())


class TestBaselineDataParallel:
    """fit/predict are GSPMD data-parallel: a 1-device and an 8-device
    mesh must produce the SAME trajectory (batches are padded to a mesh
    multiple with sample_mask 0; dropout=0 so the static row count does
    not change the rng draw)."""

    def _fixture(self, tmp_path):
        from transformers import WavLMConfig, WavLMModel

        wav_dir = tmp_path / "audios"
        wav_dir.mkdir()
        rows = []
        rng = np.random.default_rng(11)
        for i in range(12):
            cls = i % 8
            split = "Train" if i < 8 else "Development"
            name = f"MSP-PODCAST_dp_{i:03d}.wav"
            tone = np.sin(np.arange(3600 + 200 * i) * (0.04 + 0.02 * cls))
            _write_wav(str(wav_dir / name), 0.3 * tone)
            onehot = [0.0] * 8
            onehot[cls] = 1.0
            rows.append([name] + onehot + [0.5, 0.4, 0.3] + [split])
        cols = ["FileName"] + podcast.CAT_COLUMNS + podcast.ADV_COLUMNS + ["Split_Set"]
        pd.DataFrame(rows, columns=cols).to_csv(tmp_path / "labels.csv", index=False)

        torch.manual_seed(9)
        hf_cfg = WavLMConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
            conv_stride=[5, 2], num_feat_extract_layers=2,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            num_buckets=32, max_bucket_distance=64, do_stable_layer_norm=True,
            feat_extract_norm="layer", conv_bias=True, layerdrop=0.0,
        )
        WavLMModel(hf_cfg).save_pretrained(str(tmp_path / "hf"))
        return tmp_path

    @pytest.mark.parametrize("task", ["cat", "dim"])
    def test_fit_dp_matches_single_device(self, tmp_path, task):
        import jax

        from interspeech_ser_tpu.baseline.engine import BaselineEngine

        root = self._fixture(tmp_path)

        def run(nd):
            eng = BaselineEngine(
                str(root / "hf"), task=task, head_dim=16, seed=100,
                n_devices=nd, dropout=0.0,
            )
            eng.fit(
                label_path=str(root / "labels.csv"),
                audio_path=str(root / "audios"),
                model_path=str(root / f"m_{task}_{nd}"),
                batch_size=4, accumulation_steps=2, epochs=1, lr=1e-3,
            )
            return jax.tree.map(np.asarray, eng.params)

        p1, p8 = run(1), run(8)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=3e-5, rtol=1e-4),
            p1, p8,
        )
