#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Thin wrapper over interspeech_ser_tpu.joint_cli.train_text_main — text-only
RoBERTa sequence-classification fine-tune (reference: bin/old/train_cat_roberta.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.joint_cli import train_text_main

if __name__ == "__main__":
    train_text_main()
