"""Byte-determinism of the full offline pipeline (round-3 VERDICT #6).

Same seeds → byte-identical results/{train,dev,test}.csv AND stacking
submission CSV through train → eval → test → extract → RF-stack on the
synthetic fixture, with each run in a FRESH interpreter (subprocess,
SER_TPU_PLATFORM=cpu). This is the strongest pre-real-data guarantee
available in this image: when real MSP-Podcast checkpoints mount, the
offline audit becomes a pure diff against reference numbers.

Reference contract: /root/reference/bin/eval_cat_bimodal_lazy_1head.py:348-384
(CSV shapes/quirks) and /root/reference/test/stacking train/test flow.
"""

import hashlib
import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
import torch

from interspeech_ser_tpu.utils import labels as L

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

D1, D2 = 16, 12
N_TRAIN, N_DEV, N_TEST = 32, 16, 8


def _make_fixture(root):
    rng = np.random.default_rng(11)
    lazy1, lazy2 = os.path.join(root, "lazy1"), os.path.join(root, "lazy2")
    os.makedirs(lazy1), os.makedirs(lazy2)
    rows, names = [], []
    class_means = rng.normal(scale=2.0, size=(8, D1))
    for i in range(N_TRAIN + N_DEV + N_TEST):
        cls = i % 8
        name = f"MSP-PODCAST_{i:04d}.wav"
        names.append(name)
        t1, t2 = int(rng.integers(10, 40)), int(rng.integers(5, 20))
        f1 = rng.normal(size=(t1, D1)).astype(np.float32) + class_means[cls]
        f2 = rng.normal(size=(t2, D2)).astype(np.float32)
        torch.save(torch.from_numpy(f1), os.path.join(lazy1, name.replace(".wav", ".pt")))
        torch.save(torch.from_numpy(f2), os.path.join(lazy2, name.replace(".wav", ".pt")))
        onehot = [0.0] * 8
        onehot[cls] = 1.0
        split = ("Train" if i < N_TRAIN else
                 "Development" if i < N_TRAIN + N_DEV else "Test3")
        rows.append([name] + onehot + [split])
    df = pd.DataFrame(rows, columns=["FileName"] + L.CLASSES + ["Split_Set"])
    df.to_csv(os.path.join(root, "labels.csv"), index=False)
    pd.DataFrame({"FileName": names, "transcription": ["hi"] * len(names)}).to_csv(
        os.path.join(root, "transcripts.csv"), index=False)
    os.makedirs(os.path.join(root, "test"))
    df[df.Split_Set == "Test3"][["FileName"]].to_csv(
        os.path.join(root, "test", "Categorical_test.csv"), index=False)
    df.iloc[:16].to_csv(os.path.join(root, "train_stacking_sample.csv"), index=False)
    # stacking labels: FileName + EmoClass letters (all splits)
    letters = [L.CLASS_LETTERS[int(np.argmax(r))] for r in df[L.CLASSES].values]
    pd.DataFrame({"FileName": df["FileName"], "EmoClass": letters}).to_csv(
        os.path.join(root, "stacking_labels.csv"), index=False)
    return df


def _run_chain(root, exp_name):
    """One fresh-interpreter pass of the full offline chain."""
    exp = os.path.join(root, exp_name)
    cfg = {
        "wav_dir": root, "txt_dir": os.path.join(root, "transcripts.csv"),
        "lazy_dir1": os.path.join(root, "lazy1"),
        "lazy_dir2": os.path.join(root, "lazy2"),
        "label_path": os.path.join(root, "labels.csv"),
        "feat1_dim": D1, "feat2_dim": D2,
        "use_balanced_batch": False, "use_focalloss": False,
        "epochs": 2, "lr": 5e-3, "model_path": exp,
        "batch_size": 16, "accum_step": 1, "fusion_hidden_dim": 8,
    }
    cfg_path = os.path.join(root, f"config_{exp_name}.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    driver = f"""
import sys
sys.path.insert(0, {REPO!r})
from interspeech_ser_tpu.cli import train_main, eval_main, test_main, extract_train_main
train_main(argv=["--config_path", {cfg_path!r}, "--seed", "7"])
eval_main(argv=["--config_path", {cfg_path!r}])
test_main(argv=["--config_path", {cfg_path!r},
                "--test_df", {os.path.join(root, 'test', 'Categorical_test.csv')!r}])
extract_train_main(argv=["--config_path", {cfg_path!r},
                         "--train_df", {os.path.join(root, 'train_stacking_sample.csv')!r}])
sys.path.insert(0, {os.path.join(REPO, 'test')!r})
import stacking
stacking.train_main(["--experiments", {exp!r},
                     "--label_path", {os.path.join(root, 'stacking_labels.csv')!r},
                     "--out_dir", {os.path.join(exp, 'stacking_models')!r},
                     "--k", "2", "--n_estimators", "20"])
stacking.test_main(["--experiments", {exp!r},
                    "--models_dir", {os.path.join(exp, 'stacking_models')!r},
                    "--k", "2",
                    "--out", {os.path.join(exp, 'submission.csv')!r}])
"""
    env = dict(os.environ, SER_TPU_PLATFORM="cpu", PYTHONHASHSEED="0")
    env.pop("XLA_FLAGS", None)  # fresh single-device CPU, like a user run
    proc = subprocess.run(
        [sys.executable, "-c", driver], env=env, cwd=root,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (
        f"chain failed:\nSTDOUT:\n{proc.stdout[-3000:]}\nSTDERR:\n{proc.stderr[-3000:]}"
    )
    return exp


def _digests(exp):
    out = {}
    for rel in ("results/train.csv", "results/dev.csv", "results/test.csv",
                "submission.csv"):
        path = os.path.join(exp, rel)
        assert os.path.exists(path), f"missing artifact {rel}"
        out[rel] = hashlib.sha256(open(path, "rb").read()).hexdigest()
    return out


def test_full_chain_byte_deterministic(tmp_path):
    root = str(tmp_path)
    _make_fixture(root)
    exp_a = _run_chain(root, "run_a")
    exp_b = _run_chain(root, "run_b")
    da, db = _digests(exp_a), _digests(exp_b)
    assert da == db, (
        "pipeline is not byte-deterministic:\n"
        + "\n".join(f"  {k}: {da[k][:16]} vs {db[k][:16]}"
                    for k in da if da[k] != db.get(k))
    )
    # sanity: the artifacts carry the reference CSV quirks
    dev = pd.read_csv(os.path.join(exp_a, "results", "dev.csv"))
    assert list(dev.columns[:2]) == ["Filename", "Prediction"]
    test = pd.read_csv(os.path.join(exp_a, "results", "test.csv"))
    assert list(test.columns[:2]) == ["FileName", "Prediction"]
