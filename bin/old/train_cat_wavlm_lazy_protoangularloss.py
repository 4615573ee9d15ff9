#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Angular-prototypical style training (engine: train/proto_engine.py) (reference: bin/old/train_cat_wavlm_lazy_protoangularloss.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.train.proto_engine import ProtoAngularEngine  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(
        'use interspeech_ser_tpu.train.proto_engine.ProtoAngularEngine '
        '(softmax+angle-proto over class-balanced batches); see '
        'tests/test_proto_xvector.py for the end-to-end recipe'
    )
