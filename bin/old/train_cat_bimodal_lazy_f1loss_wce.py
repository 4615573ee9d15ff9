#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Differentiable F1 + weighted CE (reference: bin/old/train_cat_bimodal_lazy_f1loss_wce.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import train_main

if __name__ == "__main__":
    train_main(loss_type='f1', add_ce_to_f1=True)
