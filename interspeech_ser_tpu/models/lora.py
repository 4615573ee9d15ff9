"""LoRA as a functional parameter-tree transform (lorax-style).

Covers both reference LoRA variants:
- peft on q_proj/v_proj, r=8 α=16 (reference:
  preprocessing/preprocess_speech_pretrained.py:120-130) — attention LoRA
  for the production ``whisper_lora_ser.pt`` checkpoints;
- loralib on the FFN dense layers, r=``lora_rank`` (reference:
  lora_wavlm/model.py:40-42).

No module surgery: LoRA factors live in a parallel pytree {path → (A, B)}
and are merged functionally ``W' = W + (α/r)·A@B`` inside the jit — the
backward pass flows only into (A, B) because the base tree is wrapped in
``stop_gradient`` during training. Merged inference is mathematically
identical to peft's adapter-active forward (dropout off).
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def match_attention_qv(path: Tuple[str, ...]) -> bool:
    """peft target_modules=['q_proj','v_proj'] (both speech + whisper)."""
    return len(path) >= 2 and path[-2] in ("q_proj", "v_proj") and path[-1] == "kernel"


def match_ffn_dense(path: Tuple[str, ...]) -> bool:
    """loralib targets: FFN intermediate/output dense (lora_wavlm/model.py:40-42)."""
    return (
        len(path) >= 2
        and path[-2] in ("intermediate_dense", "output_dense")
        and path[-1] == "kernel"
    )


def _iter_kernels(params: Dict, prefix=()):
    for k, v in params.items():
        if isinstance(v, dict):
            yield from _iter_kernels(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def init_lora(
    rng,
    params: Dict,
    match_fn: Callable[[Tuple[str, ...]], bool] = match_attention_qv,
    rank: int = 8,
) -> Dict:
    """Build the LoRA tree: for each matched [in,out] kernel, A [in,r]
    (kaiming-uniform like peft) and B [r,out] (zeros → identity at init)."""
    lora: Dict = {}
    for path, w in _iter_kernels(params):
        if not match_fn(path) or np.ndim(w) != 2:
            continue
        rng, k = jax.random.split(rng)
        fan_in = w.shape[0]
        bound = np.sqrt(6.0 / fan_in)  # kaiming_uniform(a=sqrt(5)) on [r, in]
        a = jax.random.uniform(k, (w.shape[0], rank), jnp.float32, -bound, bound)
        b = jnp.zeros((rank, w.shape[1]), jnp.float32)
        node = lora
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {"lora_A": a, "lora_B": b}
    return lora


def merge_lora(params: Dict, lora: Dict, alpha: float = 16.0, rank: int = 8) -> Dict:
    """W' = W + (α/r)·A@B, leaving unmatched leaves untouched."""
    scale = alpha / rank

    def rec(p, l):
        out = {}
        for k, v in p.items():
            lv = l.get(k) if isinstance(l, dict) else None
            if isinstance(v, dict):
                out[k] = rec(v, lv or {})
            elif isinstance(lv, dict) and "lora_A" in lv:
                delta = (lv["lora_A"] @ lv["lora_B"]) * scale
                out[k] = v + delta.astype(v.dtype)
            else:
                out[k] = v
        return out

    return rec(params, lora)


def freeze_base(params: Dict) -> Dict:
    """stop_gradient on the base tree: training updates only LoRA + heads."""
    return jax.tree.map(jax.lax.stop_gradient, params)


# -- checkpoint I/O ----------------------------------------------------------


def lora_state_dict(lora: Dict) -> Dict[str, np.ndarray]:
    """Flat torch-style dict of only the LoRA factors (loralib semantics:
    lora_wavlm/ft_lora.py:227-230 saves lora-only checkpoints)."""
    sd: Dict[str, np.ndarray] = {}

    def rec(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict) and "lora_A" in v:
                sd[f"{prefix}{k}.lora_A"] = np.asarray(v["lora_A"])
                sd[f"{prefix}{k}.lora_B"] = np.asarray(v["lora_B"])
            elif isinstance(v, dict):
                rec(v, f"{prefix}{k}.")

    rec(lora, "")
    return sd


def lora_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    lora: Dict = {}
    for key, val in sd.items():
        if not (key.endswith(".lora_A") or key.endswith(".lora_B")):
            continue
        *path, leaf = key.split(".")
        node = lora
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = np.asarray(val)
    return lora


def lora_from_peft_state_dict(
    sd: Dict[str, np.ndarray], layer_prefix: str = "encoder.layers."
) -> Dict:
    """Parse peft-style names into our tree.

    peft keys look like ``...encoder.layers.{i}.attention.{q,v}_proj.
    lora_A.default.weight`` with torch [r, in] / [out, r] orientation;
    converted to flax [in, r] / [r, out].
    """
    lora: Dict = {}
    for key, val in sd.items():
        if ".lora_A." not in key and ".lora_B." not in key:
            continue
        idx = key.find(layer_prefix)
        if idx < 0:
            continue
        tail = key[idx + len(layer_prefix):]
        parts = tail.split(".")
        layer_i, module, proj = parts[0], parts[1], parts[2]  # {attention|self_attn}.{proj}
        which = "lora_A" if ".lora_A." in key else "lora_B"
        w = np.asarray(val).T  # torch [r,in]/[out,r] → flax [in,r]/[r,out]
        node = lora.setdefault(f"layer{layer_i}", {}).setdefault(module, {}).setdefault(
            proj, {}
        ).setdefault("kernel", {})
        node[which] = w
    return lora


# ---------------------------------------------------------------------------
# Non-LoRA parameter-efficient methods (adapter / adapter_l /
# embedding_prompt / combined — reference lora_wavlm/model.py:37-50).
# The new params live INSIDE the encoder param tree (models/speech.py
# Adapter / embed_prompt); these helpers split them out so engines can
# train only the finetune subset and keep the backbone frozen.
# ---------------------------------------------------------------------------

FINETUNE_KEYS = ("adapter", "embed_prompt")


def split_finetune_params(params: Dict) -> Tuple[Dict, Dict]:
    """params → (frozen_base, trainable_finetune) by subtree name."""
    base: Dict = {}
    tuned: Dict = {}

    def rec(node, b, t):
        for k, v in node.items():
            if k in FINETUNE_KEYS:
                t[k] = v
            elif isinstance(v, dict):
                b2: Dict = {}
                t2: Dict = {}
                rec(v, b2, t2)
                b[k] = b2
                if t2:
                    t[k] = t2
            else:
                b[k] = v

    rec(params, base, tuned)
    return base, tuned


def merge_finetune_params(base: Dict, tuned: Dict) -> Dict:
    """Inverse of split_finetune_params."""
    out: Dict = {}
    for k, v in base.items():
        if isinstance(v, dict):
            out[k] = merge_finetune_params(v, tuned.get(k, {}))
        else:
            out[k] = v
    for k, v in tuned.items():
        if k in FINETUNE_KEYS or k not in out:
            out[k] = v
    return out


def add_finetune_params(key, model, base_params: Dict, probe_len: int = 1600) -> Dict:
    """Init a finetune-enabled encoder and graft the pretrained base in.

    ``model`` must be a SpeechEncoderModel whose config sets
    ``finetune_method``; returns the full param tree (pretrained backbone +
    freshly-initialized adapter/prompt params).
    """
    import jax.numpy as jnp

    fresh = model.init(
        key, jnp.zeros((1, probe_len), jnp.float32),
        jnp.ones((1, probe_len), jnp.float32),
    )["params"]

    def rec(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                rec(dst.setdefault(k, {}), v)
            else:
                dst[k] = v

    merged = jax.tree.map(lambda x: x, fresh)  # copy structure
    rec(merged, base_params)  # pretrained weights win where names overlap
    return merged
