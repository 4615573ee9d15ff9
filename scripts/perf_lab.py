#!/usr/bin/env python
"""Perf experiments for the WavLM-large extraction path (run ONE at a time).

Each experiment is a subcommand so TPU processes never overlap:

  convs    — per-conv-layer timing + polyphase-matmul alternative
  ablate   — 24-layer stack with attention variants (gated/plain/none/ffn-only)
  batch    — full forward at B in {8,16,32,64}
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.models.speech import (
    ConvFeatureExtractor,
    EncoderLayer,
    SpeechEncoderModel,
    wavlm_large,
)
from scripts.profile_blocks import chain_time


def cmd_convs(args):
    cfg = wavlm_large(dtype="bfloat16")
    B, L = 16, 160000
    rng = np.random.default_rng(0)
    conv = ConvFeatureExtractor(cfg, name="fe")
    wav = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    params = conv.init(jax.random.PRNGKey(0), wav[:1])["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    # per-layer: isolate conv i by feeding a correctly-shaped input
    lengths = [L]
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        lengths.append((lengths[-1] - k) // s + 1)
    print("conv output lengths:", lengths[1:])

    only = {0, 1, 2} if not args.all_layers else set(range(7))
    for i, (k, s, ch) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride, cfg.conv_dim)):
        if i not in only:
            continue
        cin = 1 if i == 0 else cfg.conv_dim[i - 1]
        x = jnp.asarray(
            rng.normal(size=(B, lengths[i], cin)).astype(np.float32)
        ).astype(jnp.bfloat16)
        layer = nn.Conv(ch, (k,), strides=(s,), padding="VALID", use_bias=True,
                        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        p = layer.init(jax.random.PRNGKey(i), x[:1])["params"]
        t = chain_time(lambda x, p: layer.apply({"params": p}, x), x, p, n_chain=10)
        gf = 2 * B * lengths[i + 1] * ch * k * cin / 1e9
        print(f"conv{i} k={k} s={s} {cin}->{ch} T={lengths[i]}: "
              f"{t*1e3:8.3f} ms  {gf:7.1f} GF  {gf/t/1e3:6.1f} TF/s")

    # LayerNorm-over-channels cost at the fattest shape (layer-0 output)
    x = jnp.asarray(rng.normal(size=(B, lengths[1], 512)).astype(np.float32)).astype(jnp.bfloat16)
    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
    p = ln.init(jax.random.PRNGKey(9), x[:1])["params"]
    t = chain_time(lambda x, p: ln.apply({"params": p}, x).astype(jnp.bfloat16), x, p, n_chain=10)
    gb = x.size * 2 / 1e9
    print(f"LN(f32) on [B,{lengths[1]},512]: {t*1e3:8.3f} ms  (~{2*gb/t:.0f} GB/s eff)")

    # gelu-only at the same shape
    t = chain_time(lambda x: nn.gelu(x, approximate=False), x, n_chain=10)
    print(f"gelu(exact) same shape:       {t*1e3:8.3f} ms")

    # polyphase-matmul formulation of conv1 (k=3, s=2, 512->512):
    # out[t] = x[2t]@W0 + x[2t+1]@W1 + x[2t+2]@W2
    T1 = lengths[1]
    x = jnp.asarray(rng.normal(size=(B, T1, 512)).astype(np.float32)).astype(jnp.bfloat16)
    W = jnp.asarray(rng.normal(size=(3, 512, 512)).astype(np.float32)).astype(jnp.bfloat16)
    Tout = (T1 - 3) // 2 + 1

    def poly(x, W):
        xe = x[:, 0 : 2 * Tout : 2, :]          # x[2t]
        xo = x[:, 1 : 2 * Tout + 1 : 2, :]      # x[2t+1]
        xe2 = x[:, 2 : 2 * Tout + 2 : 2, :]     # x[2t+2]
        return xe @ W[0] + xo @ W[1] + xe2 @ W[2]

    t = chain_time(poly, x, W, n_chain=10)
    gf = 2 * B * Tout * 512 * 3 * 512 / 1e9
    print(f"conv1 as polyphase matmul:    {t*1e3:8.3f} ms  {gf:7.1f} GF  {gf/t/1e3:6.1f} TF/s")

    # full frontend for reference
    t = chain_time(lambda w, p: conv.apply({"params": p}, w), wav, params, n_chain=10)
    print(f"full conv frontend:           {t*1e3:8.3f} ms")


def make_stack(cfg, variant):
    """24-layer stack apply-fn with an attention variant."""
    layers = [
        EncoderLayer(cfg, has_relative_position_bias=(i == 0), name=f"layer{i}")
        for i in range(cfg.num_layers)
    ]

    def stack(h, p, fmask):
        pb = None
        for i, lyr in enumerate(layers):
            h, pb = lyr.apply({"params": p[f"layer{i}"]}, h, fmask, pb)
        return h

    return stack


def cmd_ablate(args):
    B, T, D = 16, 499, 1024
    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(jnp.bfloat16)
    fmask = jnp.ones((B, T), jnp.float32)

    results = {}
    for variant, attn_type in [("gated-bias", "wavlm"), ("plain", "standard")]:
        cfg = wavlm_large(dtype="bfloat16")
        cfg = type(cfg)(**{**cfg.__dict__, "attention_type": attn_type})
        stack = make_stack(cfg, variant)
        model = SpeechEncoderModel(cfg)
        wav = jnp.zeros((1, 16000), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), wav, jnp.ones((1, 16000), jnp.float32))["params"]
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        t = chain_time(stack, h0, params, fmask, n_chain=10)
        results[variant] = t
        print(f"stack[{variant:12s}]: {t*1e3:8.3f} ms")
    print(f"gated-bias overhead: {(results['gated-bias']-results['plain'])*1e3:.3f} ms "
          f"({(results['gated-bias']/results['plain']-1)*100:.1f}%)")


def cmd_batch(args):
    cfg = wavlm_large(dtype="bfloat16")
    model = SpeechEncoderModel(cfg)
    rng = np.random.default_rng(0)
    L = 160000
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16000), jnp.float32), jnp.ones((1, 16000), jnp.float32),
    )["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    def full(w, p, m):
        return model.apply({"params": p}, w, m)["last_hidden_state"]

    for B in (8, 16, 32, 64):
        wav = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
        mask = jnp.ones((B, L), jnp.float32)
        n_chain = max(4, 160 // B)
        t = chain_time(full, wav, params, mask, n_chain=n_chain)
        print(f"B={B:3d}: {t*1e3:8.3f} ms/batch  {B/t:7.1f} utt/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["convs", "ablate", "batch"])
    ap.add_argument("--all_layers", action="store_true")
    args = ap.parse_args()
    {"convs": cmd_convs, "ablate": cmd_ablate, "batch": cmd_batch}[args.cmd](args)


if __name__ == "__main__":
    main()
