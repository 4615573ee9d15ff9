#!/usr/bin/env python
"""RF stacking ensemble — scripted version of the reference notebooks.

Replaces ``test/[EVAL] Bimodal ensemble categorical stacking 1 head -
VFINAL.ipynb`` (5-fold StratifiedKFold RandomForest over per-experiment
logit columns, dev macro-F1 + stratified bootstrap CIs, gender splits) and
``test/[Test] Bimodal Stacking output categorical ensemble vFinal.ipynb``
(mean predict_proba across folds → argmax letter → submission CSV aligned
to the baseline order).

Subcommands:
    train  — fit the per-fold RFs on results/train.csv logits, report dev
             metrics, save rf_model_stackingv3_{i}.pkl
    test   — load the fold models, ensemble results/test.csv logits,
             write the submission CSV
"""

import argparse
import os
import pickle
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.utils.labels import CLASS_LETTERS

N_CLASSES = 8


def _load_experiment_frame(experiments, split, filename_col):
    """Join per-experiment logit columns on the utterance name."""
    merged = None
    for exp in experiments:
        df = pd.read_csv(os.path.join(exp, "results", f"{split}.csv"))
        name = os.path.basename(os.path.normpath(exp))
        cols = {f"class_{i}_prob": f"{name}_c{i}" for i in range(N_CLASSES)}
        df = df.rename(columns=cols)
        key = "Filename" if "Filename" in df.columns else "FileName"
        df = df[[key] + list(cols.values())].rename(columns={key: filename_col})
        merged = df if merged is None else merged.merge(df, on=filename_col)
    feature_names = [c for c in merged.columns if c != filename_col]
    return merged, feature_names


def get_stratified_subset(df, target, n_per_class, seed):
    """Stratified resample (notebook bootstrap, cells 38-40)."""
    parts = []
    for cls, grp in df.groupby(target):
        parts.append(grp.sample(min(n_per_class, len(grp)), random_state=seed, replace=True))
    return pd.concat(parts)


def train_main(argv=None):
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.metrics import f1_score
    from sklearn.model_selection import StratifiedKFold

    p = argparse.ArgumentParser()
    p.add_argument("--experiments", nargs="+", required=True,
                   help="experiment dirs containing results/{train,dev}.csv")
    p.add_argument("--label_path", required=True,
                   help="labels CSV with FileName + EmoClass (labels_consensus.csv)")
    p.add_argument("--out_dir", default="./stacking_models")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--n_estimators", type=int, default=500)
    args = p.parse_args(argv)

    labels = pd.read_csv(args.label_path)
    train_X, feats = _load_experiment_frame(args.experiments, "train", "FileName")
    dev_X, _ = _load_experiment_frame(args.experiments, "dev", "FileName")
    train_X = train_X.merge(labels[["FileName", "EmoClass"]], on="FileName")
    keep = [c for c in ["EmoClass", "Gender"] if c in labels.columns]
    dev_X = dev_X.merge(labels[["FileName"] + keep], on="FileName")

    np.random.seed(args.seed)
    X = train_X[feats].values
    y = train_X["EmoClass"].values
    skf = StratifiedKFold(n_splits=args.k, shuffle=True, random_state=args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    models = []
    for fold, (tr_idx, _) in enumerate(skf.split(X, y)):
        rf = RandomForestClassifier(
            random_state=42, n_estimators=args.n_estimators, max_depth=8,
            criterion="gini", min_samples_leaf=10, min_samples_split=10,
        )
        rf.fit(X[tr_idx], y[tr_idx])
        models.append(rf)
        with open(os.path.join(args.out_dir, f"rf_model_stackingv3_{fold}.pkl"), "wb") as f:
            pickle.dump(rf, f)

    # dev evaluation: mean predict_proba across folds
    Xd = dev_X[feats].values
    proba = np.mean([m.predict_proba(Xd) for m in models], axis=0)
    classes = models[0].classes_
    pred = classes[np.argmax(proba, axis=1)]
    dev_X["Prediction"] = pred
    macro = f1_score(dev_X["EmoClass"], pred, average="macro")
    micro = f1_score(dev_X["EmoClass"], pred, average="micro")
    print(f"dev macro-F1 = {macro:.4f}")
    print(f"dev micro-F1 = {micro:.4f}")

    boot = [
        f1_score(
            (s := get_stratified_subset(dev_X, "EmoClass", 200, i))["EmoClass"],
            s["Prediction"], average="macro",
        )
        for i in range(100)
    ]
    boot = np.asarray(boot)
    print(
        f"dev bootstrap macro-F1 = {boot.mean():.4f} ± {boot.std():.4f} "
        f"(min {boot.min():.4f}, max {boot.max():.4f})"
    )
    if "Gender" in dev_X.columns:
        for g in ("Female", "Male"):
            sel = dev_X[dev_X["Gender"] == g]
            if len(sel):
                print(
                    f"dev macro-F1 ({g}) = "
                    f"{f1_score(sel['EmoClass'], sel['Prediction'], average='macro'):.4f}"
                )
    return macro


def test_main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--experiments", nargs="+", required=True)
    p.add_argument("--models_dir", default="./stacking_models")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--baseline_csv", default=None,
                   help="submission CSV whose FileName order to follow")
    p.add_argument("--out", default="bimodal_ensemble_vfinal.csv")
    args = p.parse_args(argv)

    test_X, feats = _load_experiment_frame(args.experiments, "test", "FileName")
    models = []
    for fold in range(args.k):
        with open(os.path.join(args.models_dir, f"rf_model_stackingv3_{fold}.pkl"), "rb") as f:
            models.append(pickle.load(f))
    proba = np.mean([m.predict_proba(test_X[feats].values) for m in models], axis=0)
    classes = models[0].classes_
    test_X["EmoClass"] = classes[np.argmax(proba, axis=1)]
    out = test_X[["FileName", "EmoClass"]]
    if args.baseline_csv:
        order = pd.read_csv(args.baseline_csv)["FileName"]
        out = out.set_index("FileName").loc[order].reset_index()
    out.to_csv(args.out, index=False)
    print(f"wrote {args.out} ({len(out)} rows)")
    return args.out


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "train"
    if cmd == "train":
        train_main(sys.argv[2:])
    elif cmd == "test":
        test_main(sys.argv[2:])
    else:
        print("usage: stacking.py {train|test} ...")
        sys.exit(1)
