#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Dev-split scoring for the fiona variant (gated pooled reps, 8-head
attention); writes the standard results/dev.csv
(reference: bin/old/eval_cat_bimodal_lazy_fiona.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import eval_main

if __name__ == "__main__":
    eval_main(gated_pool=True, attention_heads=8)
