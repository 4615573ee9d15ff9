#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Base proto-angular trainer: unweighted CE + angle-proto on class-balanced
regrouped batches, dev scored with val-weighted CE + macro-F1, min-dev-CE
model selection to ser.pt (engine: train/proto_engine.py ProtoOnlyEngine,
ce_mode; reference: bin/old/train_cat_wavlm_lazy_protoangularloss.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.train.proto_engine import proto_main

if __name__ == "__main__":
    proto_main("wavlm_ce")
