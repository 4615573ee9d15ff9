#!/usr/bin/env python
"""TPU-native replacement for the reference script of the same name.

Thin wrapper over interspeech_ser_tpu.preprocess_cli — identical flags plus
--lora_ckpt for the (reference-hardcoded) checkpoint path
(reference: preprocessing/preprocess_whisper_pretrained.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.preprocess_cli import whisper_pretrained_main

if __name__ == "__main__":
    whisper_pretrained_main()
