"""TPU-native rebuild of the UNICAMP Interspeech-2025 SER stack.

A JAX/XLA/Pallas/pjit framework with the capability surface of
AI-Unicamp/interspeech_ser (see SURVEY.md): frozen-encoder embedding
extraction, lazy multimodal fusion training, LoRA fine-tuning, the
challenge baseline, and the stacking-ensemble submission pipeline.

Subpackages
-----------
- ``utils``   : config / seeding / logging / metrics / .pt + CSV contracts
- ``ops``     : TPU compute primitives (GRU scan, masked attention, mel, Pallas kernels)
- ``models``  : flax encoders (WavLM, Whisper, RoBERTa, ...) + fusion classifiers
- ``parallel``: device mesh + sharding helpers (pjit data/tensor parallel)
- ``train``   : losses, samplers, fusion training/eval engines
- ``extract`` : batched, sharded embedding-extraction pipeline
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SER_TPU_PLATFORM"):
    # Escape hatch for environments whose sitecustomize pins
    # ``jax_platforms`` at interpreter start (overriding JAX_PLATFORMS):
    # ``SER_TPU_PLATFORM=cpu`` re-pins it here, before any backend client
    # exists, so every CLI can run host-only (pair with
    # ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` for a
    # virtual mesh). No-op when unset: the default platform (TPU) rules.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["SER_TPU_PLATFORM"])
