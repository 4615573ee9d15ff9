#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Dim-fusion blind-test scoring (reference: bin/old/test_dim_bimodal_lazy.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import test_dim_main

if __name__ == "__main__":
    test_dim_main()
