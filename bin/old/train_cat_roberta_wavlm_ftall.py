#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Thin wrapper over interspeech_ser_tpu.joint_cli.train_main with the engine
variant that reproduces it (reference: bin/old/train_cat_roberta_wavlm_ftall.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.joint_cli import train_main

if __name__ == "__main__":
    train_main("ftall")
