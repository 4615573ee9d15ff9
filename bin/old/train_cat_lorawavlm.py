#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

LoRA WavLM trainer; see lora_wavlm/ft_lora.py for the full flag surface (reference: bin/old/train_cat_lorawavlm.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lora_wavlm.ft_lora import main

if __name__ == "__main__":
    main()
