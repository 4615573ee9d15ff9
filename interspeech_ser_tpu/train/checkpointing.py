"""Full training-state checkpoint/resume (orbax) — beyond the reference.

The reference only saves best-metric model weights; a crash restarts
training from scratch (SURVEY.md §5 'Checkpoint / resume'). This module
adds crash-safe full-state checkpoints: params + optimizer state + epoch +
best-metric book + host RNG states, written per epoch, restored with
``FusionEngine.fit(resume=True)`` (exposed as ``--resume`` on the train
CLIs). Device trees go through orbax; host RNG state through a pickle
sidecar.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ckpt_dir(model_path: str) -> str:
    return os.path.join(os.path.abspath(model_path), "ckpt_last")


def save_train_state(
    model_path: str,
    params,
    opt_state,
    epoch: int,
    best: Dict[str, Any],
    np_rng: np.random.Generator,
    jax_key,
) -> None:
    import orbax.checkpoint as ocp

    path = _ckpt_dir(model_path)
    ckptr = ocp.StandardCheckpointer()
    tree = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": jax.tree.map(np.asarray, opt_state),
        "jax_key": np.asarray(jax_key),
    }
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(model_path, "ckpt_host.pkl"), "wb") as f:
        pickle.dump(
            {"epoch": epoch, "best": best, "np_rng_state": np_rng.bit_generator.state},
            f,
        )


def load_train_state(model_path: str, params_like, opt_state_like):
    """→ (params, opt_state, epoch, best, np_rng_state, jax_key) or None."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(model_path)
    host_path = os.path.join(model_path, "ckpt_host.pkl")
    if not (os.path.exists(path) and os.path.exists(host_path)):
        return None
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": jax.tree.map(np.asarray, params_like),
        "opt_state": jax.tree.map(np.asarray, opt_state_like),
        "jax_key": np.zeros(2, np.uint32),
    }
    tree = ckptr.restore(path, template)
    with open(host_path, "rb") as f:
        host = pickle.load(f)
    return (
        tree["params"], tree["opt_state"], host["epoch"], host["best"],
        host["np_rng_state"], tree["jax_key"],
    )
