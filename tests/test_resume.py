"""Full-state checkpoint/resume (framework extension beyond the reference)."""

import json
import os
import sys

import numpy as np
import pandas as pd
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.train.engine import EngineOptions, FusionEngine
from interspeech_ser_tpu.utils import labels as L
from interspeech_ser_tpu.utils.config import load_fusion_config


def _fixture(tmp_path):
    rng = np.random.default_rng(7)
    (tmp_path / "lazy1").mkdir()
    (tmp_path / "lazy2").mkdir()
    rows = []
    means = rng.normal(scale=2.0, size=(8, 16))
    for i in range(32):
        cls = i % 8
        torch.save(
            torch.from_numpy((rng.normal(size=(20, 16)) + means[cls]).astype(np.float32)),
            str(tmp_path / "lazy1" / f"u{i:03d}.pt"),
        )
        torch.save(
            torch.from_numpy(rng.normal(size=(8, 12)).astype(np.float32)),
            str(tmp_path / "lazy2" / f"u{i:03d}.pt"),
        )
        onehot = [0.0] * 8
        onehot[cls] = 1.0
        rows.append([f"u{i:03d}.wav"] + onehot + ["Train" if i < 24 else "Development"])
    pd.DataFrame(rows, columns=["FileName"] + L.CLASSES + ["Split_Set"]).to_csv(
        tmp_path / "labels.csv", index=False
    )
    pd.DataFrame({"FileName": [r[0] for r in rows], "transcription": "x"}).to_csv(
        tmp_path / "tx.csv", index=False
    )
    cfg = {
        "wav_dir": str(tmp_path), "txt_dir": str(tmp_path / "tx.csv"),
        "lazy_dir1": str(tmp_path / "lazy1"), "lazy_dir2": str(tmp_path / "lazy2"),
        "label_path": str(tmp_path / "labels.csv"), "feat1_dim": 16, "feat2_dim": 12,
        "epochs": 4, "lr": 5e-3, "model_path": str(tmp_path / "exp"),
        "batch_size": 8, "accum_step": 1, "fusion_hidden_dim": 8,
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    return str(p)


class TestResume:
    def test_resume_continues_identically(self, tmp_path):
        cfg_path = _fixture(tmp_path)
        cfg = load_fusion_config(cfg_path)
        df = L.load_merged(cfg.label_path, cfg.txt_dir)
        tr, dv = L.split(df, "Train"), L.split(df, "Development")

        # run A: all 4 epochs straight through
        eng_a = FusionEngine(cfg, seed=7, options=EngineOptions(bucket_window=1))
        eng_a.init_params()
        best_a = eng_a.fit(tr, dv)

        # run B: interrupted after epoch 1, then resume for the remaining 2
        import shutil

        shutil.rmtree(cfg.model_path)
        eng_b = FusionEngine(cfg, seed=7, options=EngineOptions(bucket_window=1))
        eng_b.init_params()
        eng_b.fit(tr, dv, stop_after_epoch=1)
        assert os.path.isdir(os.path.join(cfg.model_path, "ckpt_last"))

        eng_c = FusionEngine(cfg, seed=7, options=EngineOptions(bucket_window=1))
        eng_c.init_params()
        best_c = eng_c.fit(tr, dv, resume=True)
        # resumed run reaches the same final best (same data order via
        # restored host RNG; same params via restored device state)
        assert best_c["epoch"] == best_a["epoch"]
        np.testing.assert_allclose(best_c["macro_f1"], best_a["macro_f1"], atol=1e-6)
