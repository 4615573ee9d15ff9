#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

MoE dev eval (reference: bin/old/eval_cat_bimodal_lazy_moe.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import eval_main

if __name__ == "__main__":
    eval_main(model_variant='moe')
