#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Thin wrapper over interspeech_ser_tpu.baseline.cli.legacy_train_main with
the variant that reproduces it (reference: bin/old/train_cat_baselinelike_xvector.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.baseline.cli import legacy_train_main

if __name__ == "__main__":
    legacy_train_main("xvector")
