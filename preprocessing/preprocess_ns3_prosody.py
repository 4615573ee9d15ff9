#!/usr/bin/env python
"""TPU-native replacement for the reference script of the same name.

Thin wrapper over interspeech_ser_tpu.preprocess_cli — identical flags plus
--encoder_ckpt/--decoder_ckpt for the (reference-hardcoded) paths
(reference: preprocessing/preprocess_ns3_prosody.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.preprocess_cli import ns3_prosody_main

if __name__ == "__main__":
    ns3_prosody_main(speaker=False)
