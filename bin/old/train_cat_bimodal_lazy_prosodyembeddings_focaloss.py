#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Bimodal over prosody embeddings with focal loss (reference: bin/old/train_cat_bimodal_lazy_prosodyembeddings_focaloss.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import train_main

if __name__ == "__main__":
    # lazy_dir2 points at ns3 prosody embeddings in the config
    train_main(loss_type='focal')
