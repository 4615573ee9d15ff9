#!/usr/bin/env python
"""TPU-native replacement for the legacy reference script of the same name.

LoRA Whisper trainer over the same engine (reference: bin/old/train_cat_lorawhisper.py).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lora_wavlm.ft_lora import main

if __name__ == "__main__":
    # pass --ssl_type <whisper dir>; the LoRA transform targets q/v
    # projections in either encoder family (whisper dirs dispatch to the
    # encoder-only whisper stack inside LoRAFTEngine)
    main()
