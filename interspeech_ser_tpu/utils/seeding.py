"""Deterministic seeding across python / numpy / JAX.

Equivalent role to the reference's ``set_deterministic``
(reference: bin/train_cat_bimodal_lazy_1head.py:46-65), minus the
torch/cuDNN knobs: XLA on TPU is deterministic by construction for a fixed
program, and all JAX randomness is keyed explicitly.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_deterministic(seed: int = 42, *, verbose: bool = True):
    """Seed python/numpy global RNGs and return a ``jax.random`` key.

    Returns
    -------
    jax.Array
        A PRNG key derived from ``seed`` for explicit JAX randomness.
    """
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    if verbose:
        print(f"Random seed set to: {seed}")
    import jax  # local import: keep module importable before platform setup

    return jax.random.PRNGKey(seed)


def numpy_generator(seed: int) -> np.random.Generator:
    """Fresh, isolated numpy Generator (used by host-side samplers)."""
    return np.random.Generator(np.random.PCG64(seed))
