#!/usr/bin/env python
"""labels_consensus.csv → one-hot processed_labels.csv.

Reference: benchmark/process_labels_for_categorical.py:10-29 (consensus
rows only, 8 one-hot emotion columns, Split_Set preserved).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.utils.labels import process_labels_for_categorical

if __name__ == "__main__":
    in_csv = sys.argv[1] if len(sys.argv) > 1 else "labels_consensus.csv"
    out_csv = sys.argv[2] if len(sys.argv) > 2 else "processed_labels.csv"
    process_labels_for_categorical(in_csv, out_csv)
    print(f"wrote {out_csv}")
