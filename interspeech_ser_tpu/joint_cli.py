"""CLI entry points for the joint roberta+wavlm family (bin/old wrappers).

Reproduces the reference scripts' config contract
(bin/old/train_cat_roberta_wavlm.py:48-114): JSON keys ``wav_dir``,
``txt_dir``, ``label_path``, ``ssl_type``, ``batch_size``, ``accum_step``,
``epochs``, ``lr``, ``model_path``, ``head_dim``, ``pooling_type`` (read,
unused — as in the reference), ``weight_decay``, ``dropout_head`` (read,
unused — the reference hardcodes its dropouts), ``use_timbre_perturb``,
``tp_prob``; optional ``use_balanced_batch``/``normalize_wav`` via
try/except defaults. ``text_type`` additionally selects the text encoder
(the reference hardcodes roberta-base / roberta-large per script).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time
from typing import Optional

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _setup_logger(model_path: str):
    from .train.engine import setup_run_logging

    return setup_run_logging(model_path)


def make_hf_tokenize(name_or_path: str, max_length: int = 128):
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(name_or_path)

    def tokenize(texts):
        return tokenizer(
            [t if isinstance(t, str) else "" for t in texts],
            padding="max_length", truncation=True, max_length=max_length,
            return_tensors="np",
        )

    return tokenize


def train_main(
    variant: str,
    argv: Optional[list] = None,
    tokenize=None,
    dtype: str = "float32",
):
    """Train one joint-family variant (see train.joint_engine.VARIANTS)."""
    from .baseline.cli import get_ssl_type
    from .train.joint_engine import VARIANTS, JointEngine

    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--config_path", type=str, default="./configs/config_cat.json")
    args = parser.parse_args(argv)

    with open(args.config_path) as f:
        config = json.load(f)
    model_path = config["model_path"]
    logger = _setup_logger(model_path)

    ssl_type = get_ssl_type(config["ssl_type"]) or config["ssl_type"]
    default_text = (
        "roberta-base" if variant in ("base", "ftall") else "roberta-large"
    )
    text_type = config.get("text_type", default_text)
    if tokenize is None:
        tokenize = make_hf_tokenize(config.get("tokenizer_path", text_type))

    opts = VARIANTS[variant]
    engine = JointEngine(
        ssl_type, text_type, tokenize, opts,
        head_dim=config["head_dim"], seed=args.seed, dtype=dtype,
    )
    logger.info(f"Starting an experimento in model path = {model_path}")
    logger.info(
        f"Using ssl = {ssl_type} LR = {config['lr']} Epochs = {config['epochs']} "
        f"Batch size = {config['batch_size']} Accum steps = {config['accum_step']}"
    )
    best = engine.fit(
        label_path=config["label_path"],
        audio_path=config["wav_dir"],
        txt_path=config["txt_dir"],
        model_path=model_path,
        batch_size=config["batch_size"],
        accumulation_steps=config["accum_step"],
        epochs=config["epochs"],
        lr=config["lr"],
        weight_decay=config.get("weight_decay", 1e-6),
        use_balanced_batch=config.get("use_balanced_batch", False),
        normalize_wav=config.get("normalize_wav", True),
        use_timbre_perturb=config.get("use_timbre_perturb", False),
        tp_prob=config.get("tp_prob", 0.0),
        log=logger.info,
    )
    return best


def train_text_main(argv: Optional[list] = None, tokenize=None, dtype: str = "float32"):
    """Text-only RoBERTa fine-tune (reference bin/old/train_cat_roberta.py)."""
    from .train.joint_engine import TextOnlyEngine

    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--config_path", type=str, default="./configs/config_cat.json")
    args = parser.parse_args(argv)
    with open(args.config_path) as f:
        config = json.load(f)
    model_path = config["model_path"]
    logger = _setup_logger(model_path)

    text_type = config.get("text_type", "roberta-base")
    if tokenize is None:
        tokenize = make_hf_tokenize(config.get("tokenizer_path", text_type))
    engine = TextOnlyEngine(text_type, tokenize, seed=args.seed, dtype=dtype)
    return engine.fit(
        label_path=config["label_path"],
        txt_path=config["txt_dir"],
        model_path=model_path,
        batch_size=config["batch_size"],
        accumulation_steps=config["accum_step"],
        epochs=config["epochs"],
        lr=config["lr"],
        use_focalloss=config.get("use_focalloss", False),
        use_balanced_batch=config.get("use_balanced_batch", False),
        log=logger.info,
    )
