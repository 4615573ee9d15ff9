"""TDNN x-vector speaker embedder (speechbrain spkrec-xvect architecture).

The reference's x-vector baseline freezes speechbrain's pretrained
``spkrec-xvect-voxceleb`` encoder as a feature extractor in front of
``EmotionRegression`` (reference: bin/old/train_cat_baselinelike_xvector.py:
32,177,199). speechbrain is not in this image; this module implements the
same architecture (5 dilated TDNN blocks → stats pooling → 512-d embedding)
with a converter from speechbrain's ``embedding_model.ckpt`` naming so a
locally provided checkpoint loads directly.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (out_channels, kernel, dilation) per TDNN block — speechbrain Xvector
TDNN_BLOCKS: Tuple = ((512, 5, 1), (512, 3, 2), (512, 3, 3), (512, 1, 1), (1500, 1, 1))


class XVector(nn.Module):
    """mel/fbank [B, T, feat] → x-vector embedding [B, lin_neurons]."""

    in_feats: int = 24
    lin_neurons: int = 512

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        frame_mask = None
        if lengths is not None:
            T0 = x.shape[1]
            frame_mask = (jnp.arange(T0)[None, :] < lengths[:, None]).astype(x.dtype)
        for i, (ch, k, d) in enumerate(TDNN_BLOCKS):
            pad = (k - 1) * d // 2
            x = nn.Conv(
                ch, (k,), kernel_dilation=(d,), padding=[(pad, pad)], name=f"tdnn{i}"
            )(x)
            x = nn.relu(x)
            x = nn.BatchNorm(
                # torch BatchNorm1d momentum 0.1 == flax momentum 0.9
                # (flax keeps `momentum` of the OLD average)
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            if frame_mask is not None:
                # re-zero the padded tail so deeper dilated convs see the
                # same zero boundary as an unpadded (batch-1) run
                x = x * frame_mask[:, :, None]
        # statistics pooling (masked mean ‖ std)
        if lengths is not None:
            T = x.shape[1]
            m = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)[:, :, None]
            denom = jnp.maximum(m.sum(axis=1), 1.0)
            mean = (x * m).sum(axis=1) / denom
            var = ((x - mean[:, None]) ** 2 * m).sum(axis=1) / denom
        else:
            mean = x.mean(axis=1)
            var = x.var(axis=1)
        std = jnp.sqrt(jnp.clip(var, min=1e-10))
        pooled = jnp.concatenate([mean, std], axis=-1)  # [B, 3000]
        return nn.Dense(self.lin_neurons, name="embedding")(pooled)


def xvector_from_speechbrain(sd: Dict[str, np.ndarray]) -> Dict:
    """speechbrain embedding_model.ckpt state dict → XVector params.

    speechbrain names: ``blocks.{2i}.conv.weight`` [out,in,k] /
    ``blocks.{2i+1}.norm.{weight,bias,running_mean,running_var}`` for the
    TDNN stack, ``blocks.11.w.weight`` for the final linear (indices differ
    across speechbrain versions; both ``blocks`` and ``fc`` layouts are
    probed).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    batch_stats: Dict = {}
    conv_keys = sorted(
        {k.rsplit(".conv.weight", 1)[0] for k in sd if k.endswith(".conv.weight")},
        key=lambda s: [int(t) for t in s.split(".") if t.isdigit()],
    )
    norm_keys = sorted(
        {k.rsplit(".norm.weight", 1)[0] for k in sd if k.endswith(".norm.weight")},
        key=lambda s: [int(t) for t in s.split(".") if t.isdigit()],
    )
    for i, (ck, nk) in enumerate(zip(conv_keys[: len(TDNN_BLOCKS)], norm_keys)):
        w = sd[f"{ck}.conv.weight"]  # [out, in, k]
        params[f"tdnn{i}"] = {
            "kernel": np.transpose(w, (2, 1, 0)),
            "bias": sd.get(f"{ck}.conv.bias", np.zeros(w.shape[0], np.float32)),
        }
        params[f"bn{i}"] = {
            "scale": sd[f"{nk}.norm.weight"],
            "bias": sd[f"{nk}.norm.bias"],
        }
        batch_stats[f"bn{i}"] = {
            "mean": sd[f"{nk}.norm.running_mean"],
            "var": sd[f"{nk}.norm.running_var"],
        }
    lin = [k for k in sd if k.endswith("w.weight") or k.endswith("linear.weight")]
    if lin:
        params["embedding"] = {
            "kernel": sd[lin[0]].T,
            "bias": sd.get(lin[0].replace("weight", "bias"), np.zeros(sd[lin[0]].shape[0])),
        }
    return {"params": params, "batch_stats": batch_stats}


def xvector_to_speechbrain(variables: Dict) -> Dict[str, np.ndarray]:
    """XVector params/batch_stats → speechbrain ``embedding_model`` names.

    Inverse of :func:`xvector_from_speechbrain`; the x-vector trainer saves
    ``final_xvector.pt`` in this layout
    (reference: bin/old/train_cat_baselinelike_xvector.py:311-312).
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    for i in range(len(TDNN_BLOCKS)):
        conv_idx, norm_idx = 3 * i, 3 * i + 2  # Conv1d, ReLU(no params), BN
        sd[f"blocks.{conv_idx}.conv.weight"] = np.transpose(
            np.asarray(params[f"tdnn{i}"]["kernel"]), (2, 1, 0)
        )
        sd[f"blocks.{conv_idx}.conv.bias"] = np.asarray(params[f"tdnn{i}"]["bias"])
        sd[f"blocks.{norm_idx}.norm.weight"] = np.asarray(params[f"bn{i}"]["scale"])
        sd[f"blocks.{norm_idx}.norm.bias"] = np.asarray(params[f"bn{i}"]["bias"])
        if f"bn{i}" in batch_stats:
            sd[f"blocks.{norm_idx}.norm.running_mean"] = np.asarray(
                batch_stats[f"bn{i}"]["mean"]
            )
            sd[f"blocks.{norm_idx}.norm.running_var"] = np.asarray(
                batch_stats[f"bn{i}"]["var"]
            )
    sd["blocks.16.w.weight"] = np.asarray(params["embedding"]["kernel"]).T
    sd["blocks.16.w.bias"] = np.asarray(params["embedding"]["bias"])
    return sd
