"""X-vector trainer + speechbrain fbank + baselinelike focalloss variant.

Reference: bin/old/train_cat_baselinelike_xvector.py, …_focalloss.py.
"""

import json
import os
import sys
import wave as wave_mod

import numpy as np
import pandas as pd
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.ops.mel import speechbrain_fbank

RNG = np.random.default_rng(9)


class TestSpeechbrainFbank:
    def test_shapes_and_mask(self):
        wav = RNG.normal(size=(2, 8000)).astype(np.float32) * 0.1
        out = np.asarray(speechbrain_fbank(jnp.asarray(wav)))
        assert out.shape == (2, 51, 24)  # 1 + 8000//160 frames
        assert np.all(np.isfinite(out))
        # sentence mean-norm: per-sample mean ~0
        np.testing.assert_allclose(out.mean(axis=(1, 2)), 0.0, atol=1e-4)

    def test_masked_matches_unpadded(self):
        """Interior frames of a padded+masked run match the unpadded run.

        Boundary frames (last ~2) legitimately differ: batch-1 reflect-pads
        the true signal tail while the padded batch continues into zeros —
        speechbrain's own batched path behaves identically, so only interior
        frames are compared (plus a small budget for the mean-norm shift the
        boundary frames induce).
        """
        w1 = RNG.normal(size=4800).astype(np.float32) * 0.1
        padded = np.zeros((1, 8000), np.float32)
        padded[0, :4800] = w1
        full = np.asarray(
            speechbrain_fbank(jnp.asarray(padded), lengths=jnp.asarray([4800.0]))
        )
        solo = np.asarray(speechbrain_fbank(jnp.asarray(w1[None])))
        n_interior = solo.shape[1] - 2
        np.testing.assert_allclose(
            full[0, :n_interior], solo[0, :n_interior], atol=0.5
        )


class TestXVectorConverters:
    def test_speechbrain_roundtrip(self):
        from interspeech_ser_tpu.models.xvector import (
            XVector,
            xvector_from_speechbrain,
            xvector_to_speechbrain,
        )

        model = XVector()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 24)))
        sd = xvector_to_speechbrain(
            {
                "params": jax.tree.map(np.asarray, variables["params"]),
                "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"]),
            }
        )
        assert "blocks.0.conv.weight" in sd and "blocks.16.w.weight" in sd
        back = xvector_from_speechbrain(sd)
        np.testing.assert_array_equal(
            back["params"]["tdnn0"]["kernel"],
            np.asarray(variables["params"]["tdnn0"]["kernel"]),
        )
        np.testing.assert_array_equal(
            back["batch_stats"]["bn2"]["var"],
            np.asarray(variables["batch_stats"]["bn2"]["var"]),
        )
        np.testing.assert_array_equal(
            back["params"]["embedding"]["kernel"],
            np.asarray(variables["params"]["embedding"]["kernel"]),
        )


def _write_wav(path, x):
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    from interspeech_ser_tpu.utils.labels import CLASSES

    root = tmp_path_factory.mktemp("xvecdata")
    wav_dir = root / "audio"
    wav_dir.mkdir()
    rows = []
    for i in range(16):
        cls = i % 8
        split = "Train" if i < 12 else "Development"
        name = f"MSP-PODCAST_{i:03d}.wav"
        tone = np.sin(np.arange(3600 + 320 * i) * (0.05 + 0.02 * cls))
        _write_wav(str(wav_dir / name), 0.3 * tone)
        onehot = [0.0] * 8
        onehot[cls] = 1.0
        rows.append([name] + onehot + [split])
    pd.DataFrame(rows, columns=["FileName"] + CLASSES + ["Split_Set"]).to_csv(
        root / "labels.csv", index=False
    )

    def make_config(model_dir, extra=None):
        cfg = {
            "wav_dir": str(wav_dir),
            "label_path": str(root / "labels.csv"),
            "ssl_type": "",
            "batch_size": 4,
            "accum_step": 2,
            "epochs": 2,
            "lr": 1e-3,
            "model_path": str(root / model_dir),
            "head_dim": 16,
            "pooling_type": "AttentiveStatisticsPooling",
            "weight_decay": 1e-6,
            "dropout_head": 0.5,
            "use_timbre_perturb": False,
            "tp_prob": 0.0,
        }
        cfg.update(extra or {})
        p = root / f"cfg_{model_dir}.json"
        with open(p, "w") as f:
            json.dump(cfg, f)
        return str(p)

    return root, make_config


class TestXVectorEngineE2E:
    def test_train_and_checkpoints(self, fixture):
        from interspeech_ser_tpu.baseline.cli import legacy_train_main

        root, make_config = fixture
        cfg = make_config("m_xvec", {"use_balanced_batch": True})
        best = legacy_train_main("xvector", argv=["--config_path", cfg, "--seed", "3"])
        assert best["epoch"] >= 0
        for f in ("final_ser.pt", "final_xvector.pt", "train_norm_stat.pkl"):
            assert os.path.exists(str(root / "m_xvec" / f)), f
        sd = torch.load(str(root / "m_xvec" / "final_xvector.pt"), weights_only=True)
        assert "blocks.0.conv.weight" in sd
        assert "blocks.2.norm.running_mean" in sd  # BN stats updated + saved

    def test_engine_reload_roundtrip(self, fixture):
        from interspeech_ser_tpu.baseline.xvector_engine import XVectorEngine

        root, _ = fixture
        e = XVectorEngine(head_dim=16, seed=5)
        e.load_checkpoints(str(root / "m_xvec"))
        wav = RNG.normal(size=(2, 6400)).astype(np.float32)
        pred, _ = e._apply(
            e.xv_params, e.xv_stats, e.head_params,
            jnp.asarray(wav), jnp.asarray([6400.0, 4000.0]), False,
        )
        assert pred.shape == (2, 8)
        assert np.all(np.isfinite(np.asarray(pred)))


class TestBaselinelikeFocalloss:
    def test_train_with_focal_and_timbre(self, fixture, tmp_path):
        from transformers import WavLMConfig, WavLMModel

        root, make_config = fixture
        hf_dir = tmp_path / "hf"
        torch.manual_seed(6)
        WavLMModel(
            WavLMConfig(
                hidden_size=24, num_hidden_layers=1, num_attention_heads=4,
                intermediate_size=48, conv_dim=[12, 12], conv_kernel=[10, 3],
                conv_stride=[5, 2], num_feat_extract_layers=2,
                num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
                num_buckets=32, max_bucket_distance=64, do_stable_layer_norm=True,
                feat_extract_norm="layer", conv_bias=True, layerdrop=0.0,
            )
        ).save_pretrained(str(hf_dir))
        from interspeech_ser_tpu.baseline.cli import legacy_train_main

        cfg = make_config(
            "m_focal",
            {
                "ssl_type": str(hf_dir),
                "use_balanced_batch": True,
                "use_timbre_perturb": True,
                "tp_prob": 0.5,
                "head_dim": 16,
            },
        )
        best = legacy_train_main("focalloss", argv=["--config_path", cfg, "--seed", "3"])
        assert best["epoch"] >= 0
        assert os.path.exists(str(root / "m_focal" / "final_ser.pt"))
