#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Baseline-style end-to-end fine-tune from the bin context — delegates to
the benchmark engine (reference: bin/old/train_cat_baselinelike.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.baseline.cli import train_main

if __name__ == "__main__":
    train_main("cat")
