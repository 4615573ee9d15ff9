#!/usr/bin/env python
"""Locate the WavLM conv-frontend time IN CONTEXT (v5e, B=32, bf16).

exp_conv2.py timed layers standalone (155 TF/s each, layers 1-6 sum
~10.3 ms) yet the full frontend measures 23.6 ms — the drag sits either
in layer 0 (patch-matmul, contraction 10 → low MXU fill) or in fusion
breaks between layers that standalone timing can't see. This measures
cumulative PREFIXES of the real frontend (conv0..convi + LN + GELU),
so per-layer deltas include every relayout XLA actually emits.

Hoist-proof chained timing (output feeds next input), scalar readback.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from interspeech_ser_tpu.models.speech import (
    ConvFeatureExtractor, PatchMatmulConv, wavlm_large,
)

ap = argparse.ArgumentParser()
ap.add_argument("--conv0", choices=["patch", "fused"], default="patch",
                help="'fused' = the shipping Pallas conv0+LN+GELU kernel")
ap.add_argument("--batch", type=int, default=32)
cli = ap.parse_args()

B, L = cli.batch, 160000
N_CHAIN = 6
rng = np.random.default_rng(0)
wav = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32) * 0.1)
cfg = wavlm_large(dtype="bfloat16")


class PrefixFrontend(nn.Module):
    n_layers: int

    @nn.compact
    def __call__(self, w):
        dt = cfg.compute_dtype
        x = w[:, :, None].astype(dt)
        for i, (out_ch, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            if i >= self.n_layers:
                break
            if i == 0:
                x = PatchMatmulConv(out_ch, k, s, cfg.conv_bias, dt,
                                    name=f"conv{i}")(x)
            else:
                x = nn.Conv(out_ch, (k,), strides=(s,), padding="VALID",
                            use_bias=cfg.conv_bias, dtype=dt,
                            param_dtype=jnp.float32, name=f"conv{i}")(x)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             param_dtype=jnp.float32, name=f"conv_ln{i}")(x).astype(dt)
            x = nn.gelu(x, approximate=cfg.use_approx_gelu)
        return x


def timed(model, params):
    @jax.jit
    def chained(p, w):
        def body(i, w):
            out = model.apply({"params": p}, w)
            return w + (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(w.dtype)
        return jnp.sum(jax.lax.fori_loop(0, N_CHAIN, body, w))

    float(chained(params, wav))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(chained(params, wav))
        best = min(best, time.perf_counter() - t0)
    return best / N_CHAIN


import dataclasses

prev = 0.0
for n in range(1, 8):
    if cli.conv0 == "fused":
        # the real shipping frontend, truncated to n layers: Pallas
        # conv0+LN+GELU kernel + XLA convs 1..n-1
        c = dataclasses.replace(
            cfg, conv_dim=cfg.conv_dim[:n], conv_kernel=cfg.conv_kernel[:n],
            conv_stride=cfg.conv_stride[:n],
        )
        model = ConvFeatureExtractor(config=c, fused_prefix=1)
    else:
        model = PrefixFrontend(n_layers=n)
    params = model.init(jax.random.PRNGKey(0), wav[:1])["params"]
    t = timed(model, params)
    print(f"prefix conv0..conv{n-1}: {t*1e3:7.2f} ms   (+{(t-prev)*1e3:6.2f} ms "
          f"for layer {n-1})", flush=True)
    prev = t
