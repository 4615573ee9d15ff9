"""Core runtime tests: config, metrics, labels, .pt I/O."""

import json

import numpy as np
import pandas as pd
import pytest
import torch
from sklearn.metrics import f1_score

from interspeech_ser_tpu.utils import labels as L
from interspeech_ser_tpu.utils import ptio
from interspeech_ser_tpu.utils.config import load_fusion_config
from interspeech_ser_tpu.utils.metrics import LogManager, concordance_ccc, macro_f1, micro_f1

RNG = np.random.default_rng(3)


@pytest.fixture
def bimodal_config(tmp_path):
    cfg = {
        "wav_dir": "/data/Audios",
        "txt_dir": "/data/whisper_transcripts.csv",
        "lazy_dir1": "/data_tmp/whisper_large_v3",
        "lazy_dir2": "/data_tmp/roberta_large",
        "label_path": "/data/processed_labels.csv",
        "feat1_dim": 1280,
        "feat2_dim": 1024,
        "use_balanced_batch": False,
        "use_focalloss": False,
        "epochs": 20,
        "lr": 1e-5,
        "model_path": "./experiments/x",
        "batch_size": 64,
        "accum_step": 1,
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return str(p)


class TestConfig:
    def test_reference_schema_loads(self, bimodal_config):
        cfg = load_fusion_config(bimodal_config)
        assert cfg.feat1_dim == 1280 and cfg.lr == 1e-5 and not cfg.is_trimodal
        assert cfg.feat_dims == (1280, 1024)

    def test_optional_flags_default_false(self, tmp_path, bimodal_config):
        raw = json.loads(open(bimodal_config).read())
        del raw["use_balanced_batch"], raw["use_focalloss"]
        p = tmp_path / "c2.json"
        p.write_text(json.dumps(raw))
        cfg = load_fusion_config(str(p))
        assert cfg.use_balanced_batch is False and cfg.use_focalloss is False

    def test_accum_must_divide_batch(self, tmp_path, bimodal_config):
        raw = json.loads(open(bimodal_config).read())
        raw["accum_step"] = 3
        p = tmp_path / "c3.json"
        p.write_text(json.dumps(raw))
        with pytest.raises(ValueError):
            load_fusion_config(str(p))

    def test_trimodal_detection(self, tmp_path, bimodal_config):
        raw = json.loads(open(bimodal_config).read())
        raw["lazy_dir3"] = "/data_tmp/ns3"
        raw["feat3_dim"] = 256
        p = tmp_path / "c4.json"
        p.write_text(json.dumps(raw))
        cfg = load_fusion_config(str(p))
        assert cfg.is_trimodal and cfg.feat_dims == (1280, 1024, 256)


class TestMetrics:
    def test_macro_f1_matches_sklearn(self):
        for _ in range(20):
            y_true = RNG.integers(0, 8, 100)
            y_pred = RNG.integers(0, 8, 100)
            np.testing.assert_allclose(
                macro_f1(y_true, y_pred), f1_score(y_true, y_pred, average="macro"), atol=1e-12
            )

    def test_macro_f1_missing_classes(self):
        y_true = np.array([0, 0, 1, 1])
        y_pred = np.array([0, 1, 1, 1])
        np.testing.assert_allclose(
            macro_f1(y_true, y_pred), f1_score(y_true, y_pred, average="macro"), atol=1e-12
        )

    def test_micro_f1(self):
        y_true = RNG.integers(0, 8, 50)
        y_pred = RNG.integers(0, 8, 50)
        np.testing.assert_allclose(
            micro_f1(y_true, y_pred), f1_score(y_true, y_pred, average="micro"), atol=1e-12
        )

    def test_ccc_identity(self):
        x = RNG.normal(size=200)
        assert concordance_ccc(x, x) > 0.999

    def test_log_manager(self):
        lm = LogManager()
        lm.alloc_stat_type_list(["loss", "acc"])
        lm.add_stat("loss", 2.0)
        lm.add_stat("loss", 4.0)
        assert lm.get_stat("loss") == 3.0
        assert lm.get_stat("acc") == 0.0
        lm.init_stat()
        assert lm.get_stat("loss") == 0.0


def _label_df(n=200):
    idx = RNG.integers(0, 8, n)
    onehot = np.eye(8)[idx]
    df = pd.DataFrame(onehot, columns=L.CLASSES)
    df.insert(0, "FileName", [f"u{i:04d}.wav" for i in range(n)])
    df["Split_Set"] = ["Train"] * (n // 2) + ["Development"] * (n - n // 2)
    return df


class TestLabels:
    def test_class_weights_formula(self):
        df = _label_df()
        w = L.class_weights(df)
        freq = df[L.CLASSES].sum().values
        np.testing.assert_allclose(w, len(df) / (8 * freq), rtol=1e-6)

    def test_balanced_sample_weights_normalized(self):
        df = _label_df()
        sw = L.balanced_sample_weights(df)
        assert sw.shape == (len(df),)
        assert np.all(sw > 0)

    def test_merge_semantics(self, tmp_path):
        df = _label_df(20)
        lp = tmp_path / "labels.csv"
        df.to_csv(lp, index=False)
        txt = pd.DataFrame(
            {"FileName": df["FileName"][:10], "transcription": ["hi"] * 10}
        )
        tp = tmp_path / "txt.csv"
        txt.to_csv(tp, index=False)
        merged = L.load_merged(str(lp), str(tp))
        assert len(merged) == 20  # left merge keeps all label rows
        assert merged["transcription"].isna().sum() == 10

    def test_labels_to_index(self):
        onehot = np.eye(8)[[3, 1, 7]]
        np.testing.assert_array_equal(L.labels_to_index(onehot), [3, 1, 7])

    def test_neutral_margin_targets(self):
        onehot = np.zeros((3, 8))
        onehot[0, 7] = 1  # Neutral
        onehot[1, 0] = 1
        onehot[2, 7] = 1
        np.testing.assert_array_equal(L.neutral_margin_targets(onehot), [1, -1, 1])

    def test_process_labels_for_categorical(self, tmp_path):
        cons = pd.DataFrame(
            {
                "FileName": ["a.wav", "b.wav", "c.wav", "d.wav"],
                "EmoClass": ["A", "X", "N", "H"],
                "Split_Set": ["Train", "Train", "Development", "Train"],
            }
        )
        p = tmp_path / "labels_consensus.csv"
        cons.to_csv(p, index=False)
        out = L.process_labels_for_categorical(str(p))
        assert len(out) == 3  # X dropped
        assert out.iloc[0]["Angry"] == 1.0
        assert out.iloc[1]["Neutral"] == 1.0
        assert list(out.columns) == ["FileName"] + L.CLASSES + ["Split_Set"]


class TestPtIO:
    def test_tensor_roundtrip(self, tmp_path):
        arr = RNG.normal(size=(37, 129)).astype(np.float32)
        p = str(tmp_path / "x.pt")
        ptio.save_tensor(arr, p)
        back = ptio.load_tensor(p)
        np.testing.assert_array_equal(arr, back)
        # and torch itself can read it (the reference's consumer)
        t = torch.load(p, weights_only=True)
        np.testing.assert_array_equal(arr, t.numpy())

    def test_reads_reference_style_dump(self, tmp_path):
        feats = torch.randn(55, 1024)
        p = str(tmp_path / "utt.pt")
        torch.save(feats, p)
        np.testing.assert_array_equal(ptio.load_tensor(p), feats.numpy())

    def test_pure_python_reader_matches_torch(self, tmp_path):
        from interspeech_ser_tpu.utils.ptio import _load_pt_no_torch

        arr = RNG.normal(size=(7, 13)).astype(np.float32)
        p = str(tmp_path / "x.pt")
        torch.save(torch.from_numpy(arr), p)
        np.testing.assert_array_equal(_load_pt_no_torch(p), arr)

        sd = {"a.weight": torch.randn(4, 3), "b.bias": torch.randn(5)}
        p2 = str(tmp_path / "sd.pt")
        torch.save(sd, p2)
        back = _load_pt_no_torch(p2)
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k].numpy())
