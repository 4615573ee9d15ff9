#!/usr/bin/env python
"""Decompose the conv0 block cost (v5e, B=32, bf16). NEGATIVE RESULT.

exp_frontend_prefix attributed ~12 ms to the conv0 block against a
~1.3 ms "output-write floor" — implying ~10 ms of recoverable headroom.
This experiment calibrated the harness floor and A/B'd patch layouts;
both premises were wrong (real v5e, B=32, chained-dispatch timing):

    write floor [B,32000,512]       5.364 ms   (broadcast-mul + fold read:
                                                2.1 GB HBM ≈ 52% stream eff)
    per-phase (old layout)          6.606 ms   ← shipped layout: 1.25 ms
                                                 over the stream floor
    toeplitz b8/b16/b32/b64     11.5-15.3 ms   ← 2x WORSE: the 8.5x zero
                                                 padding FLOPs are NOT free
    per-phase + LN(f32)            10.371 ms   ← LN is a real +3.8 ms pass
    per-phase + LN + GELU          10.387 ms     (GELU fuses into it free)

Conclusions: (1) the per-phase patch layout is ~optimal for the conv0
matmul itself — the "12 ms conv0 block" was mostly the measurement's own
1-GB fold pass plus real stream bandwidth (~52% of the 819 GB/s spec for
write+read mixes); (2) the blocked-Toeplitz relayout (contraction 85
instead of 10) loses ~2x despite better MXU fill, because conv0 is
bandwidth- not MXU-limited; it is kept INLINE here (never shipped);
(3) the LN+GELU epilogue is NOT fused by XLA into the conv0 matmul — it
is a separate ~3.8 ms read+write pass over the 1-GB activation (the
exp_convln "dead even" result compared f32-LN vs bf16-LN, both unfused).
That epilogue is exactly what the depth-1 fused Pallas frontend removes;
its measured e2e win (+1.6 ms) is smaller than 3.8, so the kernel's own
matmul side gives back ~2 ms. Tile size is NOT the cause: a block_f
sweep of the shipping depth-1 path (scripts/exp_frontend_blockf.py,
1024/2048/4096/8192) measured 20.82/20.82/20.68/20.52 ms frontend — a
wash; the residual is the kernel's per-tap contraction-5 matmuls on the
5-lane wav grid, which the data volume makes cheap enough to live with.

Run: python scripts/exp_conv0_anatomy.py [--batch 32]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from interspeech_ser_tpu.models.speech import PatchMatmulConv, wavlm_large

cfg = wavlm_large(dtype="bfloat16")
N_CHAIN = 6


def timed(fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, w):
            out = fn(w, *a[1:])
            return w + (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(w.dtype)
        return jnp.sum(jax.lax.fori_loop(0, N_CHAIN, body, a[0]))

    float(chained(*args))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N_CHAIN


def toeplitz_conv(w, k2d, k, s, t_out, dt, F):
    """Blocked-Toeplitz layout (measured 2x WORSE than per-phase; kept
    inline for reproducibility — never shipped). Packs F output frames
    per row; each row is one (s·F + k − s)-sample patch against a
    block-Toeplitz weight [patch, F·C] whose off-band entries are zero."""
    B, L = w.shape
    C = k2d.shape[-1]
    n_rows = -(-t_out // F)
    row_w = s * F
    patch_w = row_w + k - s
    need = (n_rows + 1) * row_w
    xw = w.astype(dt)
    if need > L:
        xw = jnp.pad(xw, ((0, 0), (0, need - L)))
    body = xw[:, : n_rows * row_w].reshape(B, n_rows, row_w)
    halo = xw[:, row_w : (n_rows + 1) * row_w].reshape(B, n_rows, row_w)
    patches = jnp.concatenate([body, halo[:, :, : k - s]], axis=-1)
    w_blk = jnp.stack(
        [jnp.pad(k2d, ((p * s, patch_w - k - p * s), (0, 0))) for p in range(F)],
        axis=1,
    )
    out = patches @ w_blk.reshape(patch_w, F * C).astype(dt)
    return out.reshape(B, n_rows * F, C)[:, :t_out]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    B, L = args.batch, 160000
    dt = cfg.compute_dtype
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32) * 0.1)

    conv = PatchMatmulConv(512, 10, 5, cfg.conv_bias, dt, name="conv0")
    params = conv.init(jax.random.PRNGKey(0), wav[:1, :, None])["params"]
    k2d = jnp.asarray(params["kernel"]).reshape(10, 512)
    ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                      param_dtype=jnp.float32)
    ln_params = ln.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 4, 512), dt))["params"]

    t_out = (L - 10) // 5 + 1
    ones_c = jnp.ones((512,), dt)

    def per_phase(w):
        return conv.apply({"params": params}, w[:, :, None])

    stages = {
        # calibration: same-shape output from a free op → harness floor
        # (output write + the chain fold's 1 GB read)
        "write floor [B,32000,512]": lambda w: (
            w[:, :32000, None].astype(dt) * ones_c
        ),
        "per-phase (shipped)": per_phase,
        "toeplitz b8": lambda w: toeplitz_conv(w, k2d, 10, 5, t_out, dt, 8),
        "toeplitz b16": lambda w: toeplitz_conv(w, k2d, 10, 5, t_out, dt, 16),
        "toeplitz b32": lambda w: toeplitz_conv(w, k2d, 10, 5, t_out, dt, 32),
        "toeplitz b64": lambda w: toeplitz_conv(w, k2d, 10, 5, t_out, dt, 64),
        "per-phase + LN(f32)": lambda w: ln.apply(
            {"params": ln_params}, per_phase(w)
        ).astype(dt),
        "per-phase + LN + GELU": lambda w: nn.gelu(
            ln.apply({"params": ln_params}, per_phase(w)).astype(dt),
            approximate=cfg.use_approx_gelu),
    }
    out_gb = B * t_out * 512 * 2 / 1e9
    print(f"output tensor: {out_gb*1e3:.0f} MB bf16; pure write floor "
          f"~{out_gb/0.819:.2f} ms (fold adds ~1 read pass)\n")
    for name, fn in stages.items():
        t = timed(fn, wav)
        print(f"{name:28s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
