#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Label smoothing (pre-1head) (reference: bin/old/train_cat_bimodal_lazy_labelsmoothing.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import train_main

if __name__ == "__main__":
    train_main(loss_type='labelsmooth', attention_heads=4)
