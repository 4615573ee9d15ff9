#!/usr/bin/env python
"""TPU-native replacement for the reference script of the same name.

Thin wrapper over interspeech_ser_tpu.baseline.cli — identical CLI flags
(reference: benchmark/train_eval_files/train_dim_ser.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.baseline.cli import train_main

if __name__ == "__main__":
    train_main(task='dim')
