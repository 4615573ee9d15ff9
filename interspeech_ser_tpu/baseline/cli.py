"""Runners for the challenge-baseline ``benchmark/train_eval_files`` CLIs.

Flag surface and file contracts match the reference scripts: argparse
flags (train_cat_ser.py:29-40, eval_cat_ser.py:36-40), configs/config_cat.json
for paths, ``final_{ser,ssl,pool}.pt`` + ``train_norm_stat.pkl`` artifacts,
test3 submission CSVs, and the inference-time-per-audio-second printout
(eval_dim_ser.py:159-162).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

SSL_BOOK = {
    "wavlm-large": "microsoft/wavlm-large",
    "wavlm-base": "microsoft/wavlm-base",
}


def get_ssl_type(name: str):
    """Reference benchmark/utils/etc.py name book; paths pass through."""
    if name in SSL_BOOK:
        return SSL_BOOK[name]
    return name if os.path.exists(name) else None


def _train_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--ssl_type", type=str, default="wavlm-large")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--accumulation_steps", type=int, default=1)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--model_path", type=str, default="./temp")
    p.add_argument("--head_dim", type=int, default=1024)
    p.add_argument("--pooling_type", type=str, default="AttentiveStatisticsPooling")
    p.add_argument("--config_path", type=str, default="configs/config_cat.json")
    return p


def _eval_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--ssl_type", type=str, default="wavlm-large")
    p.add_argument("--model_path", type=str, default="./model/cat_ser/7/")
    p.add_argument("--pooling_type", type=str, default="AttentiveStatisticsPooling")
    p.add_argument("--head_dim", type=int, default=1024)
    p.add_argument("--store_path")
    p.add_argument("--config_path", type=str, default="configs/config_cat.json")
    return p


def _load_paths(config_path: str):
    with open(config_path) as f:
        cfg = json.load(f)
    return cfg["wav_dir"], cfg["label_path"]


def _engine(args, task: str, dtype: str = "float32"):
    from .engine import BaselineEngine

    ssl = get_ssl_type(args.ssl_type)
    assert ssl is not None, print("Invalid SSL type!")
    return BaselineEngine(
        ssl, task=task, head_dim=args.head_dim,
        seed=getattr(args, "seed", 100), dtype=dtype,
    )


def train_main(task: str = "cat", argv=None):
    args = _train_parser().parse_args(argv)
    audio_path, label_path = _load_paths(args.config_path)
    # dim training runs in bf16 (the reference trains dim under AMP autocast,
    # train_dim_ser.py:150-169)
    engine = _engine(args, task, dtype="bfloat16" if task == "dim" else "float32")
    return engine.fit(
        label_path, audio_path, args.model_path,
        batch_size=args.batch_size, accumulation_steps=args.accumulation_steps,
        epochs=args.epochs, lr=args.lr,
    )


def eval_main(task: str = "cat", dev: bool = False, argv=None):
    from . import data as bdata
    from .engine import write_test3_submission
    from .podcast import load_adv_emo_label, load_cat_emo_label

    args = _eval_parser().parse_args(argv)
    audio_path, label_path = _load_paths(args.config_path)
    engine = _engine(args, task)
    engine.load_checkpoints(args.model_path)
    mean, std = bdata.load_norm_stat(os.path.join(args.model_path, "train_norm_stat.pkl"))

    timing = {}
    if dev:
        loader = load_cat_emo_label if task == "cat" else load_adv_emo_label
        utts, labs = loader(label_path, "dev")
        wavs = bdata.load_audio(audio_path, utts)
        ds = bdata.WavDataset(wavs, labs, utts, wav_mean=mean, wav_std=std)
        res = engine.evaluate(ds)
        print(f"dev loss = {res['loss']}")
        preds = res["preds"]
        dtype_name = "dev"
    else:
        # test3 wav discovery (eval_cat_ser.py:96)
        utts = sorted([f for f in os.listdir(audio_path) if "test3" in f])
        wavs = bdata.load_audio(audio_path, utts)
        ds = bdata.WavDataset(wavs, None, utts, wav_mean=mean, wav_std=std)
        preds = engine.predict(ds, timing=timing)
        dtype_name = "test3"

    if task == "cat":
        out = write_test3_submission(preds, utts, args.model_path, dtype_name)
    else:
        import pandas as pd

        clip = lambda v: min(max(1.0, v * 6 + 1), 7.0)  # eval_dim_ser.py:135
        df = pd.DataFrame(
            {
                "FileName": list(utts),
                "EmoAct": [clip(p[0]) for p in preds],
                "EmoVal": [clip(p[2]) for p in preds],
                "EmoDom": [clip(p[1]) for p in preds],
            }
        ).sort_values(by="FileName").reset_index(drop=True)
        os.makedirs(os.path.join(args.model_path, "results"), exist_ok=True)
        out = os.path.join(args.model_path, "results", f"{dtype_name}.csv")
        df.to_csv(out, index=False)

    if timing.get("audio_sec"):
        print("Duration of whole dev+test set", timing["audio_sec"], "sec")
        print("Inference time", timing["inference"], "sec")
        print("Inference time per sec", timing["inference"] / timing["audio_sec"], "sec")
    if args.store_path:
        with open(args.store_path, "w") as f:
            f.write(out + "\n")
    return out


def legacy_train_main(variant: str = "base", argv=None):
    """Config-JSON-driven baselinelike trainers (reference bin/old/).

    Variants: 'base' (train_cat_baselinelike.py), 'focalloss'
    (…_focalloss.py: loss = unweighted CE + focal γ3 dynamic-α), 'xvector'
    (…_xvector.py: speechbrain x-vector encoder instead of an SSL model).
    Config keys follow the reference contract (…baselinelike.py:50-71):
    wav_dir, label_path, ssl_type, batch_size, accum_step, epochs, lr,
    model_path, head_dim, pooling_type, weight_decay, dropout_head,
    use_timbre_perturb, tp_prob (+ optional use_balanced_batch,
    normalize_wav). 'xvector' additionally honors optional xvector_ckpt
    (path to a speechbrain embedding_model checkpoint).
    """
    from ..train.engine import setup_run_logging

    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--config_path", type=str, default="./configs/config_cat.json")
    args = p.parse_args(argv)
    with open(args.config_path) as f:
        cfg = json.load(f)
    model_path = cfg["model_path"]
    logger = setup_run_logging(model_path)
    common = dict(
        label_path=cfg["label_path"],
        audio_path=cfg["wav_dir"],
        model_path=model_path,
        batch_size=cfg["batch_size"],
        accumulation_steps=cfg["accum_step"],
        epochs=cfg["epochs"],
        lr=cfg["lr"],
        use_balanced_batch=cfg.get("use_balanced_batch", False),
        normalize_wav=cfg.get("normalize_wav", True),
        log=logger.info,
    )
    if variant == "xvector":
        from .xvector_engine import XVectorEngine

        engine = XVectorEngine(
            head_dim=cfg["head_dim"], seed=args.seed,
            xvector_ckpt=cfg.get("xvector_ckpt"),
        )
        return engine.fit(**common)

    from .engine import BaselineEngine

    ssl = get_ssl_type(cfg["ssl_type"]) or cfg["ssl_type"]
    engine = BaselineEngine(
        ssl, task="cat", head_dim=cfg["head_dim"], seed=args.seed,
        dropout=cfg.get("dropout_head", 0.5),
        loss_mode="ce_focal3" if variant == "focalloss" else "wce",
    )
    return engine.fit(
        weight_decay=cfg.get("weight_decay", 1e-2),
        use_timbre_perturb=cfg.get("use_timbre_perturb", False),
        tp_prob=cfg.get("tp_prob", 0.0),
        **common,
    )
