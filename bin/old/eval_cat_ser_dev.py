#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Baseline dev evaluation — delegates to the benchmark engine
(reference: bin/old/eval_cat_ser_dev.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.baseline.cli import eval_main

if __name__ == "__main__":
    eval_main("cat", dev=True)
