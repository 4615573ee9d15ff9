#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Dimensional (CCC) trainer warm-started from a categorical checkpoint: the
config's ``pretrained_path`` names a cat-trained ``multimodal_ser.pt``;
weights are loaded where name+shape match, so the 8-way head is skipped in
favor of the fresh 3-dim regression head
(reference: bin/old/train_dim_bimodal_lazy_fromcat.py:97,342-352).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import train_main

if __name__ == "__main__":
    train_main(task="dim", init_from_pretrained=True)
