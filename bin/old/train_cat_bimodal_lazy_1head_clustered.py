#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

The reference script is the base 1head trainer verbatim (its only diff is a
``map_location="cpu"`` on the feature loads — semantics identical, the
"clustered" features arrive via the config's lazy dirs), so this wrapper is
the plain trainer (reference: bin/old/train_cat_bimodal_lazy_1head_clustered.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import train_main

if __name__ == "__main__":
    train_main()
