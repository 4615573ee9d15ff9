#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Dim-fusion dev scoring (reference: bin/old/eval_dim_bimodal_lazy.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import eval_dim_main

if __name__ == "__main__":
    eval_dim_main()
