#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Trimodal dev eval (reference: bin/old/eval_cat_trimodal_lazy.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import eval_main

if __name__ == "__main__":
    eval_main(trimodal=True)
