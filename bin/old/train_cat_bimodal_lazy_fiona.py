#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

"fiona" bimodal variant: 8-head cross attention, sigmoid gates on the
pooled representations, and an always-on CKA coupling of the gated
speech/text reps added to the CE/focal loss (focal with dynamic alpha)
(reference: bin/old/train_cat_bimodal_lazy_fiona.py:269-339,409-441).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import train_main

if __name__ == "__main__":
    train_main(
        gated_pool=True, attention_heads=8, cka_weight=1.0,
        focal_dynamic_alpha=True,
    )
