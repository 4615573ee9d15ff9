#!/usr/bin/env python
"""TPU-native replacement for the reference script of the same name.

Thin wrapper over interspeech_ser_tpu.cli — identical CLI flags and
config-JSON semantics (reference: bin/train_cat_trimodal_lazy_1head.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.cli import train_main

if __name__ == "__main__":
    train_main(ranking=False, trimodal=True)
