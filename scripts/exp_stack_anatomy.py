#!/usr/bin/env python
"""In-context cost anatomy of the WavLM 24-layer encoder stack (v5e, bf16).

profile_blocks (r03, bench variant, B=16) put the stack at 40.5 ms =
128.9 TF/s = 65% of v5e bf16 peak; FLOP speed-of-light is ~26.5 ms. This
script localizes the missing ~35% by CUMULATIVE ABLATION inside an
otherwise-identical 24-layer stack: each variant deletes exactly one
non-GEMM component (softmax, rel-pos gate, rel-pos bias add, LayerNorms)
so the per-variant delta is that component's true in-context cost —
standalone block timings are I/O-inflated (1 layer standalone measured
4.24 ms vs 1.69 ms in-stack) and cannot be trusted for this.

Ablations run on the XLA attention path (the oneshot2 kernel cannot be
ablated without forking it); the kernel-vs-XLA delta is measured
separately on the unablated stack. No parity expected — random weights,
timing only.

Run: python scripts/exp_stack_anatomy.py [--batch 16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from interspeech_ser_tpu.models.speech import (
    _relative_position_buckets,
    wavlm_large,
)
from interspeech_ser_tpu.ops.attention_core import dot_product_attention_btd

cfg = wavlm_large(dtype="bfloat16")
D, H, F, NL = cfg.hidden_size, cfg.num_heads, cfg.intermediate_size, cfg.num_layers
hd = D // H
T = 499  # frames of a 10-s utterance


class AblatedLayer(nn.Module):
    """EncoderLayer mirror (pre-LN wavlm flavor) with deletable parts."""

    use_softmax: bool = True
    use_gate: bool = True
    use_bias: bool = True
    use_ln: bool = True
    use_kernel: bool = False

    @nn.compact
    def __call__(self, x, pos_bias):
        dt = cfg.compute_dtype

        def ln(name, h):
            if not self.use_ln:
                return h.astype(dt)
            return nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                param_dtype=jnp.float32, name=name,
            )(h).astype(dt)

        dense = lambda f, name: nn.Dense(
            f, dtype=dt, param_dtype=jnp.float32, name=name
        )

        h = ln("layer_norm", x)
        q = dense(D, "q_proj")(h)
        k = dense(D, "k_proj")(h)
        v = dense(D, "v_proj")(h)

        gate = None
        if self.use_gate and self.use_bias:
            gate_in = h.reshape(*h.shape[:2], H, hd).transpose(0, 2, 1, 3)
            proj = dense(8, "gru_rel_pos_linear")(gate_in)
            proj = proj.astype(jnp.float32).reshape(*proj.shape[:3], 2, 4).sum(-1)
            gates = jax.nn.sigmoid(proj)
            const = self.param(
                "gru_rel_pos_const", nn.initializers.ones, (1, H, 1, 1), jnp.float32
            )
            gate = (gates[..., 0:1] * (gates[..., 1:2] * const - 1.0) + 2.0)[..., 0]

        bias = pos_bias if self.use_bias else None
        if self.use_softmax:
            attn = dot_product_attention_btd(
                q, k, v, H, key_mask=None, gate=gate, shared_bias=bias,
                allow_kernel=self.use_kernel,
            )
        else:
            # same matmul FLOPs + bias/gate elementwise, NO softmax
            qh = q.reshape(*q.shape[:2], H, hd).transpose(0, 2, 1, 3)
            kh = k.reshape(*k.shape[:2], H, hd).transpose(0, 2, 1, 3)
            vh = v.reshape(*v.shape[:2], H, hd).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
            s = s * (hd ** -0.5)
            if bias is not None:
                b = bias[None].astype(jnp.float32)
                s = s + (gate[..., None] * b if gate is not None else b)
            p = (s * (1.0 / T)).astype(dt)  # stand-in for the P matrix
            o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
            attn = o.transpose(0, 2, 1, 3).reshape(*q.shape)
        x = x + dense(D, "out_proj")(attn)

        h = ln("final_layer_norm", x)
        h = dense(F, "intermediate_dense")(h)
        h = nn.gelu(h, approximate=cfg.use_approx_gelu)
        return x + dense(D, "output_dense")(h)


class AblatedStack(nn.Module):
    use_softmax: bool = True
    use_gate: bool = True
    use_bias: bool = True
    use_ln: bool = True
    use_kernel: bool = False

    @nn.compact
    def __call__(self, x, pos_bias):
        for i in range(NL):
            x = AblatedLayer(
                self.use_softmax, self.use_gate, self.use_bias, self.use_ln,
                self.use_kernel, name=f"layer{i}",
            )(x, pos_bias)
        return x


def chain_time(fn, x, params, pb, n_chain=10, reps=3):
    @jax.jit
    def chained(x, params, pb):
        def body(i, x):
            y = fn(x, params, pb)
            delta = jnp.sum(y.astype(jnp.float32)) * 1e-12
            return x + delta.astype(x.dtype)

        return jax.lax.fori_loop(0, n_chain, body, x)

    float(jnp.sum(chained(x, params, pb)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(chained(x, params, pb)))
        best = min(best, time.perf_counter() - t0)
    return best / n_chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    B = args.batch
    rng = np.random.default_rng(0)
    dt = cfg.compute_dtype
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(dt)
    # layer-0-style shared position bias, precomputed once outside the stack
    rel = rng.normal(size=(cfg.num_buckets, H)).astype(np.float32) * 0.02
    buckets = np.asarray(_relative_position_buckets(T, T, cfg.num_buckets, cfg.max_distance))
    pb = jnp.asarray(rel[buckets].transpose(2, 0, 1)).astype(dt)  # [H, T, T]

    qkvo_gf = 4 * 2 * B * T * D * D / 1e9
    sdpa_gf = 2 * 2 * B * T * T * D / 1e9
    ffn_gf = 2 * 2 * B * T * D * F / 1e9
    gemm_gf = NL * (qkvo_gf + sdpa_gf + ffn_gf)

    variants = [
        ("kernel full (oneshot2)", dict(use_kernel=True)),
        ("xla full", dict()),
        ("xla -softmax", dict(use_softmax=False)),
        ("xla -gate", dict(use_gate=False)),
        ("xla -gate -bias", dict(use_gate=False, use_bias=False)),
        ("xla -LN", dict(use_ln=False)),
        ("xla skeleton (-sm -gate -bias -LN)",
         dict(use_softmax=False, use_gate=False, use_bias=False, use_ln=False)),
    ]
    results = {}
    for name, kw in variants:
        model = AblatedStack(**kw)
        params = model.init(jax.random.PRNGKey(0), x[:1], pb)["params"]
        params = jax.tree.map(lambda a: a.astype(dt) if a.ndim >= 2 else a, params)
        try:
            t = chain_time(
                lambda h, p, b: model.apply({"params": p}, h, b), x, params, pb
            )
            results[name] = t
            print(f"{name:38s} {t*1e3:8.3f} ms  {gemm_gf/t/1e3:7.1f} TF/s(GEMM)",
                  flush=True)
        except Exception as e:
            print(f"{name:38s} FAILED {type(e).__name__}: {e}", flush=True)

    if "xla full" in results:
        base = results["xla full"]
        print(f"\ndeltas vs xla full ({base*1e3:.3f} ms):")
        for name, t in results.items():
            if name != "xla full":
                print(f"  {name:36s} {(base-t)*1e3:+8.3f} ms")
    print(f"\nGEMM speed-of-light at 197 TF/s: {gemm_gf/197/1e3*1e3:.2f} ms")


if __name__ == "__main__":
    main()
