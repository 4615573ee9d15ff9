#!/usr/bin/env python
"""Per-block timing breakdown of the WavLM-large extraction forward.

The tunneled runtime defeats per-call timing (block_until_ready returns
early; dispatch RTT dominates), so every block is measured with the same
chained-dependency trick bench.py uses: N dependent evaluations of the
block inside ONE jit, one timed dispatch, slope = per-eval time.

Usage:  python scripts/profile_blocks.py [--dtype bfloat16] [--batch 16]
Prints a table: block, ms/eval, GFLOP, TFLOP/s, % of full forward.
"""

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.models.speech import (
    ConvFeatureExtractor,
    EncoderLayer,
    SpeechEncoderModel,
    wavlm_large,
)

SECONDS = 10.0


def chain_time(fn, x, *rest, n_chain=10, reps=2):
    """Time n_chain dependent evals of fn inside one jit; returns s/eval.

    fn: (x, *rest) -> y with y reduced to a scalar folded back into x.
    ``rest`` (params etc.) MUST ride as jit arguments — captured closures
    become HLO constants and overflow the tunnel's remote-compile payload.
    """

    @jax.jit
    def chained(x, *rest):
        def body(i, x):
            y = fn(x, *rest)
            delta = jnp.sum(y.astype(jnp.float32)) * 1e-12
            return x + delta.astype(x.dtype)

        return jax.lax.fori_loop(0, n_chain, body, x)

    out = chained(x, *rest)
    float(jnp.sum(out))  # compile + warm with forced readback
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chained(x, *rest)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / n_chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n_chain", type=int, default=10)
    ap.add_argument(
        "--variant", default="plain", choices=["plain", "bench"],
        help="'bench' profiles the shipping extraction variant "
        "(inference_kernels=True → oneshot2 attention, fused conv0 "
        "frontend); 'plain' is the XLA-everywhere path",
    )
    args = ap.parse_args()

    cfg = wavlm_large(dtype=args.dtype)
    fused_fe = 0
    if args.variant == "bench":
        import dataclasses

        from interspeech_ser_tpu.models.speech import default_fused_frontend

        cfg = dataclasses.replace(cfg, inference_kernels=True)
        fused_fe = default_fused_frontend(cfg)
    B = args.batch
    L = int(16000 * SECONDS)
    D, H, F = cfg.hidden_size, cfg.num_heads, cfg.intermediate_size
    rng = np.random.default_rng(0)
    dt = cfg.compute_dtype

    model = SpeechEncoderModel(cfg, fused_frontend=fused_fe)
    wav = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), wav[:1], mask[:1])["params"]
    if args.dtype == "bfloat16":
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    # frame count after the conv frontend
    T = (
        model.apply({"params": params}, wav[:1], mask[:1])["last_hidden_state"].shape[1]
    )
    print(f"B={B} L={L} T={T} D={D} dtype={args.dtype}")
    h0 = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(dt)
    fmask = jnp.ones((B, T), jnp.float32)

    rows = []

    def add(name, sec, gflop):
        rows.append((name, sec * 1e3, gflop, gflop / sec / 1e3))

    # --- full forward -----------------------------------------------------
    def full(w, p):
        return model.apply({"params": p}, w, mask)["last_hidden_state"]

    t_full = chain_time(full, wav, params, n_chain=args.n_chain)
    # FLOP accounting (2 flops/MAC), per batch:
    conv_gf = 0.0
    length = L
    cin = 1
    for k, s, cout in zip(cfg.conv_kernel, cfg.conv_stride, cfg.conv_dim):
        length = (length - k) // s + 1
        conv_gf += 2 * B * length * cout * k * cin / 1e9
        cin = cout
    qkvo_gf = 4 * 2 * B * T * D * D / 1e9
    sdpa_gf = 2 * 2 * B * H * T * T * (D // H) / 1e9
    ffn_gf = 2 * 2 * B * T * D * F / 1e9
    layer_gf = qkvo_gf + sdpa_gf + ffn_gf
    full_gf = conv_gf + 24 * layer_gf + 2 * B * T * 512 * D / 1e9
    add("full forward", t_full, full_gf)

    # --- conv frontend ----------------------------------------------------
    conv = ConvFeatureExtractor(cfg, fused_prefix=fused_fe, name="feature_extractor")
    t_conv = chain_time(
        lambda w, p: conv.apply({"params": p}, w),
        wav, params["feature_extractor"], n_chain=args.n_chain,
    )
    add("conv frontend", t_conv, conv_gf)

    # --- encoder stack (24 layers, layer0 computes the position bias) -----
    layers = [
        EncoderLayer(cfg, has_relative_position_bias=(i == 0), name=f"layer{i}")
        for i in range(cfg.num_layers)
    ]

    def stack(h, p):
        pb = None
        for i, lyr in enumerate(layers):
            h, pb = lyr.apply({"params": p[f"layer{i}"]}, h, fmask, pb)
        return h

    t_stack = chain_time(stack, h0, params, n_chain=args.n_chain)
    add("24-layer stack", t_stack, 24 * layer_gf)

    # --- one encoder layer (layer 1, reusing a fixed position bias) -------
    pb_const = jnp.asarray(
        rng.normal(size=(H, T, T)).astype(np.float32)
    ).astype(dt)

    def one_layer(h, p, pb):
        out, _ = layers[1].apply({"params": p}, h, fmask, pb)
        return out

    t_layer = chain_time(one_layer, h0, params["layer1"], pb_const, n_chain=args.n_chain)
    add("1 encoder layer", t_layer, layer_gf)

    # --- attention sub-block (QKV+gate+SDPA+out-proj, via the layer) ------
    from interspeech_ser_tpu.models.speech import SpeechSelfAttention

    attn = SpeechSelfAttention(cfg, has_relative_position_bias=False, name="attention")

    def attn_block(h, p, pb):
        out, _ = attn.apply({"params": p}, h, fmask, pb)
        return out

    t_attn = chain_time(
        attn_block, h0, params["layer1"]["attention"], pb_const, n_chain=args.n_chain
    )
    add("attention block", t_attn, qkvo_gf + sdpa_gf)

    # --- FFN sub-block -----------------------------------------------------
    from interspeech_ser_tpu.models.speech import FeedForward

    ffn = FeedForward(cfg, name="feed_forward")
    t_ffn = chain_time(
        lambda h, p: ffn.apply({"params": p}, h),
        h0, params["layer1"]["feed_forward"], n_chain=args.n_chain,
    )
    add("FFN block", t_ffn, ffn_gf)

    # --- bare SDPA (no projections) ----------------------------------------
    from interspeech_ser_tpu.ops.attention_core import dot_product_attention

    qkv = jnp.asarray(
        rng.normal(size=(3, B, H, T, D // H)).astype(np.float32)
    ).astype(dt)
    gate = jnp.asarray(rng.normal(size=(B, H, T)).astype(np.float32)).astype(dt)

    def sdpa(q, k, v, g, pb):
        return dot_product_attention(q, k, v, key_mask=fmask, gate=g, shared_bias=pb)

    t_sdpa = chain_time(sdpa, qkv[0], qkv[1], qkv[2], gate, pb_const, n_chain=args.n_chain)
    add("bare SDPA (gated bias)", t_sdpa, sdpa_gf)

    def sdpa_plain(q, k, v):
        return dot_product_attention(q, k, v, key_mask=fmask)

    t_sdpa_plain = chain_time(sdpa_plain, qkv[0], qkv[1], qkv[2], n_chain=args.n_chain)
    add("bare SDPA (no bias)", t_sdpa_plain, sdpa_gf)

    print(f"\n{'block':28s} {'ms/eval':>9s} {'GFLOP':>8s} {'TFLOP/s':>8s} {'% full':>7s}")
    for name, ms, gf, tf in rows:
        print(f"{name:28s} {ms:9.3f} {gf:8.1f} {tf:8.1f} {ms / (t_full * 1e3) * 100:6.1f}%")
    # consistency: conv + stack ≈ full
    print(
        f"\nconv+stack = {(t_conv + t_stack) * 1e3:.3f} ms vs full {t_full * 1e3:.3f} ms; "
        f"attn+ffn = {(t_attn + t_ffn) * 1e3:.3f} ms vs layer {t_layer * 1e3:.3f} ms; "
        f"utt/s = {B / t_full:.1f}"
    )


if __name__ == "__main__":
    main()
