#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Angle-proto-only trainer (engine: train/proto_engine.py ProtoOnlyEngine,
variant 'melspec_only') — PerfectBatchSampler batches, class-major regrouping,
RAdam + per-step cosine, min-val-angle model selection to angle_ser.pt
(reference: bin/old/train_cat_melspec_lazy_protoangularloss_only.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.train.proto_engine import proto_main

if __name__ == "__main__":
    proto_main("melspec_only")
