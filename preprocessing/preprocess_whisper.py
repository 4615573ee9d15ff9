#!/usr/bin/env python
"""TPU-native replacement for the reference script of the same name.

Thin wrapper over interspeech_ser_tpu.preprocess_cli — identical CLI flags
(reference: preprocessing/preprocess_whisper.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.preprocess_cli import whisper_main

if __name__ == "__main__":
    whisper_main()
