#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Single-modality lazy classifier over cached wavlm-base-plus-sv features
(proj → 1-head self-attn → conv1d → 32x max-pool → mean → MLP; the feature
dim — 768 — comes from the config's feat1_dim)
(reference: bin/old/train_cat_wavlmbaseplussv_lazy.py:196-291).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import train_main

if __name__ == "__main__":
    train_main(model_variant="single")
