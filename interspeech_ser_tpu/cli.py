"""Shared CLI runners behind the ``bin/`` entry points.

The reference ships 13 self-contained scripts whose bodies differ only in
{modalities, ranking head, sampler, loss} (SURVEY.md §2.2); here each script
is a thin wrapper over one of these four runners. CLI flags and config-JSON
semantics are identical to the reference (``--seed``, ``--config_path``,
plus ``--train_df`` for the extract scripts), so existing configs and launch
commands run unchanged.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .train.engine import (
    EngineOptions,
    FusionEngine,
    save_predictions_with_probs,
    setup_run_logging,
)
from .utils import labels as L
from .utils.config import load_fusion_config
from .utils.seeding import set_deterministic


def _parser(extract: bool = False, test: bool = False) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--config_path", type=str, default="./configs/config_cat.json")
    p.add_argument("--resume", action="store_true",
                   help="resume from the per-epoch full-state checkpoint "
                        "(framework extension; the reference restarts from scratch)")
    if extract:
        p.add_argument("--train_df", type=str, default="./test/train_stacking_sample.csv")
    if test:
        # reference hardcodes ./test/Categorical_test.csv (test…stacking.py:114)
        p.add_argument("--test_df", type=str, default="./test/Categorical_test.csv")
    return p


def _engine(cfg, seed: int, ranking: bool, trimodal: bool, **overrides) -> FusionEngine:
    overrides.setdefault("focal_dynamic_alpha", trimodal)
    options = EngineOptions(ranking=ranking, **overrides)
    return FusionEngine(cfg, seed=seed, options=options)


def train_main(
    ranking: bool = False,
    trimodal: bool = False,
    argv=None,
    gender_labels_csv: str = None,
    **engine_overrides,
) -> dict:
    """Fusion trainer; ``engine_overrides`` expose the legacy bin/old
    capability surface (task='dim', loss_type, cka_weight, gender_mode,
    model_variant='moe', mse_weight — see EngineOptions)."""
    args = _parser().parse_args(argv)
    set_deterministic(seed=args.seed)
    cfg = load_fusion_config(args.config_path, trimodal=trimodal or None)
    logger = setup_run_logging(cfg.model_path)
    logger.info(
        f"Starting a lazy fusion experiment in model path = {cfg.model_path}"
    )
    logger.info(
        f"Using LR = {cfg.lr} Epochs = {cfg.epochs} Batch size = {cfg.batch_size} "
        f"Accum steps = {cfg.accum_step}"
    )
    logger.info(f"Using balanced batch = {cfg.use_balanced_batch}")
    logger.info(f"Using focalloss = {cfg.use_focalloss}")

    df = L.load_merged(cfg.label_path, cfg.txt_dir)
    if engine_overrides.get("gender_mode") and gender_labels_csv:
        # gender targets from labels_consensus (…_grlgender.py:143-149)
        import pandas as pd

        gdf = pd.read_csv(gender_labels_csv)
        df = df.merge(gdf[["FileName", "Gender"]], on="FileName", how="left")
        df["target_gender"] = df["Gender"].map({"Female": 0, "Male": 1}).fillna(0).astype(int)
    train_df = L.split(df, "Train")
    val_df = L.split(df, "Development")
    if engine_overrides.get("task") != "dim":
        logger.info(f"Class weights: {L.class_weights(train_df)}")

    engine = _engine(cfg, args.seed, ranking, trimodal, **engine_overrides)
    engine.init_params()
    if engine_overrides.get("init_from_pretrained"):
        # …_fromcat.py: warm-start from the cat-trained checkpoint named by
        # the config's pretrained_path, keeping name+shape matches only
        engine.load_torch_checkpoint_filtered(cfg.raw["pretrained_path"])
        logger.info(f"Warm-started from {cfg.raw['pretrained_path']}")
    logger.info("Starting training...")
    best = engine.fit(train_df, val_df, log=logger, resume=getattr(args, 'resume', False))
    if engine_overrides.get("task") == "dim":
        logger.info(f"Best epoch {best['epoch']+1}: dev loss = {best['dev_loss']:.6f}")
    else:
        logger.info(f"Best epoch {best['epoch']+1}: dev macro-F1 = {best['macro_f1']:.6f}")
    return best


def _scoring_engine(args, ranking: bool, trimodal: bool, strict: bool, **overrides):
    set_deterministic(seed=args.seed)
    cfg = load_fusion_config(args.config_path, trimodal=trimodal or None)
    engine = _engine(cfg, args.seed, ranking, trimodal, **overrides)
    engine.init_params()
    engine.load_torch_checkpoint(
        os.path.join(cfg.model_path, "multimodal_ser.pt"), strict=strict
    )
    return cfg, engine


def eval_main(ranking: bool = False, trimodal: bool = False, argv=None, **overrides) -> str:
    """Dev-split scoring → results/dev.csv (reference eval_cat_*…py)."""
    from .train.data import LazyFeatureDataset

    args = _parser().parse_args(argv)
    cfg, engine = _scoring_engine(args, ranking, trimodal, strict=False, **overrides)
    logger = setup_run_logging(cfg.model_path)

    df = L.load_merged(cfg.label_path, cfg.txt_dir)
    val_df = L.split(df, "Development")
    ds = LazyFeatureDataset(
        val_df["FileName"].tolist(), val_df[L.CLASSES].values, cfg.lazy_dirs, cfg.feat_dims
    )
    logger.info("Starting evaluation...")
    res = engine.evaluate(ds)
    # unweighted CE on dev, as the eval script logs (eval…1head.py:341-346)
    logger.info(f"|Metrics| eval_loss = {res['loss']:.6f} eval f1 = {res['macro_f1']:.6f}")
    return save_predictions_with_probs(
        res["logits"], val_df["FileName"].tolist(), cfg.model_path, dtype="dev",
        filename_header="Filename",
    )


def test_main(ranking: bool = False, trimodal: bool = False, argv=None, **overrides) -> str:
    """Blind-test scoring → results/test.csv (reference test_cat_*stacking*)."""
    import pandas as pd

    from .train.data import LazyFeatureDataset

    args = _parser(test=True).parse_args(argv)
    cfg, engine = _scoring_engine(args, ranking, trimodal, strict=True, **overrides)
    test_df = pd.read_csv(args.test_df)
    dummy_labels = np.zeros((len(test_df), cfg.num_emotions), np.float32)
    ds = LazyFeatureDataset(
        test_df["FileName"].tolist(), dummy_labels, cfg.lazy_dirs, cfg.feat_dims
    )
    logits = engine.predict(ds)
    return save_predictions_with_probs(
        logits, test_df["FileName"].tolist(), cfg.model_path, dtype="test",
        filename_header="FileName",
    )


def extract_train_main(trimodal: bool = False, argv=None) -> str:
    """Train-subset scoring → results/train.csv for stacking-model training."""
    import pandas as pd

    from .train.data import LazyFeatureDataset

    args = _parser(extract=True).parse_args(argv)
    cfg, engine = _scoring_engine(args, ranking=False, trimodal=trimodal, strict=False)
    label_df = pd.read_csv(args.train_df)
    text_df = pd.read_csv(cfg.txt_dir)
    df = label_df.merge(text_df, on="FileName", how="left")
    sub_df = df[df["Split_Set"] == "Train"]
    ds = LazyFeatureDataset(
        sub_df["FileName"].tolist(), sub_df[L.CLASSES].values, cfg.lazy_dirs, cfg.feat_dims
    )
    logits = engine.predict(ds)
    return save_predictions_with_probs(
        logits, sub_df["FileName"].tolist(), cfg.model_path, dtype="train",
        filename_header="Filename",
    )


def eval_dim_main(trimodal: bool = False, argv=None, **overrides) -> str:
    """Dim-fusion dev scoring → results/dev.csv with EmoAct/EmoDom/EmoVal
    predictions (reference bin/old/eval_dim_bimodal_lazy.py)."""
    import csv as _csv

    from .train.data import LazyFeatureDataset
    from .utils.metrics import concordance_ccc

    args = _parser().parse_args(argv)
    cfg, engine = _scoring_engine(
        args, ranking=False, trimodal=trimodal, strict=False, task="dim", **overrides
    )
    logger = setup_run_logging(cfg.model_path)
    df = L.load_merged(cfg.label_path, cfg.txt_dir)
    val_df = L.split(df, "Development")
    cols = list(engine.opt.dim_columns or ("EmoAct", "EmoDom", "EmoVal"))
    ds = LazyFeatureDataset(
        val_df["FileName"].tolist(), val_df[cols].values, cfg.lazy_dirs, cfg.feat_dims
    )
    preds = engine.predict(ds)
    labels = val_df[cols].values
    cccs = [concordance_ccc(preds[:, i], labels[:, i]) for i in range(len(cols))]
    logger.info(f"|Metrics| dev CCC = {cccs}")
    os.makedirs(os.path.join(cfg.model_path, "results"), exist_ok=True)
    out = os.path.join(cfg.model_path, "results", "dev.csv")
    with open(out, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["Filename"] + cols)
        for utt, row in zip(val_df["FileName"], preds):
            w.writerow([utt] + [f"{v:.4f}" for v in row])
    return out


def test_dim_main(trimodal: bool = False, argv=None, **overrides) -> str:
    """Dim-fusion blind-test scoring (reference bin/old/test_dim_bimodal_lazy.py)."""
    import csv as _csv

    import pandas as pd

    from .train.data import LazyFeatureDataset

    args = _parser(test=True).parse_args(argv)
    cfg, engine = _scoring_engine(
        args, ranking=False, trimodal=trimodal, strict=True, task="dim", **overrides
    )
    test_df = pd.read_csv(args.test_df)
    cols = list(engine.opt.dim_columns or ("EmoAct", "EmoDom", "EmoVal"))
    ds = LazyFeatureDataset(
        test_df["FileName"].tolist(),
        np.zeros((len(test_df), len(cols)), np.float32),
        cfg.lazy_dirs, cfg.feat_dims,
    )
    preds = engine.predict(ds)
    os.makedirs(os.path.join(cfg.model_path, "results"), exist_ok=True)
    out = os.path.join(cfg.model_path, "results", "test.csv")
    with open(out, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["FileName"] + cols)
        for utt, row in zip(test_df["FileName"], preds):
            w.writerow([utt] + [f"{v:.4f}" for v in row])
    return out
