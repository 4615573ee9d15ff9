#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

Gender-ranking bimodal variant: 8-head attention, NO post-projection
LayerNorms, a plain (non-reversed) gender head on the fused representation,
and an SVM margin-ranking loss on (male − female) scores x0.01. The
reference's non-focal branch computes its CE on the gender logits — a
latent bug the engine replicates (gender_mode='svm')
(reference: bin/old/train_cat_bimodal_lazy_gender_svm.py:26-43,301-373,446-467).

Gender targets come from labels_consensus.csv (reference hardcodes its
cluster path at L162); point GENDER_LABELS_CSV at your copy.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from interspeech_ser_tpu.cli import train_main

if __name__ == "__main__":
    train_main(
        gender_mode="svm", attention_heads=8, modality_norm=False,
        focal_dynamic_alpha=True,
        gender_labels_csv=os.environ.get("GENDER_LABELS_CSV"),
    )
