"""RF stacking ensemble scripts (train + test submission)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "test"))

from interspeech_ser_tpu.utils.labels import CLASS_LETTERS


@pytest.fixture
def stacking_fixture(tmp_path):
    rng = np.random.default_rng(17)
    n_train, n_dev, n_test = 120, 60, 20
    names = {
        "train": [f"tr{i:03d}.wav" for i in range(n_train)],
        "dev": [f"dv{i:03d}.wav" for i in range(n_dev)],
        "test": [f"te{i:03d}.wav" for i in range(n_test)],
    }
    y = {
        "train": rng.integers(0, 8, n_train),
        "dev": rng.integers(0, 8, n_dev),
    }
    exps = []
    for e in range(2):
        d = tmp_path / f"exp{e}" / "results"
        d.mkdir(parents=True)
        for split in ("train", "dev", "test"):
            n = len(names[split])
            if split in y:
                logits = rng.normal(size=(n, 8)) + 4.0 * np.eye(8)[y[split]]
            else:
                logits = rng.normal(size=(n, 8))
            header = "FileName" if split == "test" else "Filename"
            df = pd.DataFrame({header: names[split]})
            df["Prediction"] = [CLASS_LETTERS[i] for i in np.argmax(logits, 1)]
            for c in range(8):
                df[f"class_{c}_prob"] = np.round(logits[:, c], 4)
            df.to_csv(d / f"{split}.csv", index=False)
        exps.append(str(tmp_path / f"exp{e}"))

    labels = pd.DataFrame(
        {
            "FileName": names["train"] + names["dev"],
            "EmoClass": [CLASS_LETTERS[i] for i in np.concatenate([y["train"], y["dev"]])],
            "Gender": ["Female", "Male"] * ((n_train + n_dev) // 2),
        }
    )
    lp = tmp_path / "labels_consensus.csv"
    labels.to_csv(lp, index=False)
    return tmp_path, exps, str(lp)


class TestStacking:
    def test_train_and_test_submission(self, stacking_fixture, capsys):
        import stacking

        tmp_path, exps, labels = stacking_fixture
        out_dir = str(tmp_path / "models")
        macro = stacking.train_main(
            ["--experiments"] + exps + ["--label_path", labels, "--out_dir", out_dir,
             "--n_estimators", "50"]
        )
        assert macro > 0.7  # separable synthetic logits
        for i in range(5):
            assert os.path.exists(os.path.join(out_dir, f"rf_model_stackingv3_{i}.pkl"))
        captured = capsys.readouterr().out
        assert "bootstrap" in captured and "Female" in captured

        baseline = tmp_path / "baseline_order.csv"
        order = pd.DataFrame({"FileName": [f"te{i:03d}.wav" for i in reversed(range(20))]})
        order.to_csv(baseline, index=False)
        out_csv = str(tmp_path / "sub.csv")
        stacking.test_main(
            ["--experiments"] + exps + ["--models_dir", out_dir,
             "--baseline_csv", str(baseline), "--out", out_csv]
        )
        sub = pd.read_csv(out_csv)
        assert list(sub.columns) == ["FileName", "EmoClass"]
        assert list(sub["FileName"]) == list(order["FileName"])  # aligned order
        assert set(sub["EmoClass"]) <= set(CLASS_LETTERS)
