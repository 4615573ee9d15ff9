#!/usr/bin/env python
"""Tile-size (block_f) sweep for the depth-1 fused conv0 frontend (v5e).

exp_conv0_anatomy showed the conv0 LN+GELU epilogue is a ~3.8 ms unfused
XLA pass, yet the depth-1 fused kernel that removes it only netted
+1.6 ms e2e — its matmul side gives ~2 ms back. The shipping call used
the module default block_f=1024 while the winning sweep configuration
measured at 2048; this sweeps block_f for the REAL shipping path
(frontend alone + full encoder e2e, B=32, bf16, oneshot2 attention).

MEASURED (real v5e, frontend alone, B=32): 1024 → 20.82 ms, 2048 →
20.82, 4096 → 20.68, 8192 → 20.52. A WASH — the default stays 1024; the
kernel's residual ~2 ms over the stream floor is its per-tap
contraction-5 matmuls on the 5-lane wav grid, not tile geometry.

Run: python scripts/exp_frontend_blockf.py [--batch 32]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from interspeech_ser_tpu.models.speech import (
    ConvFeatureExtractor,
    SpeechEncoderModel,
    wavlm_large,
)
import interspeech_ser_tpu.ops.pallas.conv_frontend as cfmod

N_CHAIN = 8


def timed(apply_fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, w):
            out = apply_fn(w, *a[1:])
            return w + (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(w.dtype)
        return jnp.sum(jax.lax.fori_loop(0, N_CHAIN, body, a[0]))

    float(chained(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, (time.perf_counter() - t0) / N_CHAIN)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    B, T = args.batch, 160000
    cfg = dataclasses.replace(
        wavlm_large(dtype="bfloat16"), inference_kernels=True
    )
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
    mask = jnp.ones((B, T), jnp.float32)

    orig = cfmod.fused_conv_frontend

    def with_block(bf):
        def f(*a, **kw):
            kw.setdefault("block_f", bf)
            return orig(*a, **kw)
        return f

    fe = ConvFeatureExtractor(cfg, fused_prefix=1)
    fe_params = fe.init(jax.random.PRNGKey(0), wav[:1])["params"]
    model = SpeechEncoderModel(cfg, fused_frontend=1)
    full_params = model.init(jax.random.PRNGKey(0), wav[:1], mask[:1])["params"]
    full_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), full_params)

    def fwd(w, m, p):
        return model.apply({"params": p}, w, m)["last_hidden_state"]

    for bf in (1024, 2048, 4096, 8192):
        cfmod.fused_conv_frontend = with_block(bf)
        try:
            t_fe = timed(lambda w: fe.apply({"params": fe_params}, w), wav)
            t_e2e = timed(fwd, wav, mask, full_params)
            print(f"block_f={bf:5d}: frontend {t_fe*1e3:7.2f} ms   "
                  f"e2e {t_e2e*1e3:7.2f} ms  {B/t_e2e:7.1f} utt/s", flush=True)
        except Exception as e:
            print(f"block_f={bf:5d}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
    cfmod.fused_conv_frontend = orig


if __name__ == "__main__":
    main()
