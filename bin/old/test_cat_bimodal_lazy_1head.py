#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

1-head blind-test scoring (reference: bin/old/test_cat_bimodal_lazy_1head.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import test_main

if __name__ == "__main__":
    test_main()
