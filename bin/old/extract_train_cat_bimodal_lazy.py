#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Train-subset scoring for stacking (reference: bin/old/extract_train_cat_bimodal_lazy.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import extract_train_main

if __name__ == "__main__":
    extract_train_main()
