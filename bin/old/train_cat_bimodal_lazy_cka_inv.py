#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Inverse-CKA coupling (reference: bin/old/train_cat_bimodal_lazy_cka_inv.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import train_main

if __name__ == "__main__":
    # inverse coupling: REWARD alignment instead of penalizing it
    train_main(cka_weight=-0.1)
