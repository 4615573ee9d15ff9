#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Bimodal trainer over prosody VQ-code features (reference: bin/old/train_cat_bimodal_lazy_prosodycodes.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import train_main

if __name__ == "__main__":
    # features produced by preprocess_ns3_prosody.py --codes
    train_main()
