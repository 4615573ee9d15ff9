#!/usr/bin/env python
"""Whisper-shape attention A/B: recurrent flash vs oneshot2 vs XLA (v5e).

The whisper encoder is the zoo's MFU floor (~53%; 45.9 win/s r03). Its
T=1500 is the quadratic-attention regime the recurrent flash kernel
(ops/pallas/flash_attention.py) was built for, but the recorded flash
negative predates both oneshot2 and the whisper lane-blocked branch —
this script closes that loop (round-3 VERDICT item #1).

Measures, at the exact whisper-large-v3 encoder shape (B=8, H=20,
T=1500, hd=64, bf16, no bias):
  1. isolated SDPA: xla / flash (block sweep) / oneshot2 full-D /
     oneshot2 lane-blocked (forced via the VMEM budget knob);
  2. end-to-end encoder windows/s with each impl forced
     (SER_TPU_ATTN_IMPL) vs the shipping default.

Reference hot path: /root/reference/preprocessing/preprocess_whisper.py:57,71.
Run: python scripts/exp_whisper_flash.py

MEASURED (v5e bf16, r04) — isolated SDPA B8 H20 T1500 hd64:
  xla 6.15 ms | oneshot2 full-D 4.30 | oneshot2 lane-blocked 4.33
  flash 256x256 8.88 | 512x512 5.83 | 128x256 11.60 | 512x1536 4.30
  → the RECURRENT flash formulation LOSES at whisper shapes (the m/l
    rescale recurrence costs more than it saves; it only ties when
    bk=1536 makes it effectively one-shot). e2e: default 45.5, forced
    flash 23.1 (relayout + slow kernel), forced xla 34.7 win/s.
    VERDICT r03 item #1 closes as a NEGATIVE: oneshot2 stays default.
  Softmax-opt sweep at this shape: fused 3.88 (+10%), exp2 5.02, psum
  4.40, baseline 4.27 → 'fused' ships as the no-bias-path default.
  Maskless fast path (whisper passes no key mask; analytic
  l -= n_pad·exp(-m) fixup replaces the [bq,Tk] madd pass): bq sweep
  mask/nomask 512: 4.13/OOM-67M, 384: 4.10/4.01, 256: 4.60/3.91,
  128: 4.47/4.27 → maskless caps bq at 256 (VMEM necessity + optimum).
  'nomax' (skip max-shift): 4.44 vs 3.98 with the original fixup —
  negative; after the r04 review fix replaced the fixup with the
  real-slice denominator sum, nomax re-measures 3.86 vs 4.22 (+9%) —
  but exp(s) overflows f32 at s > ~88, silently wrong on adversarial
  inputs, so it STAYS a zero-default experiment flag; shipping it would
  trade correctness guarantees for 9% on one model.
  NET: e2e whisper extraction 45.9 → 48.0 win/s (+4.6%); the remaining
  SDPA cost is the VPU exp floor (~3.7e8 exps/layer ≈ 3 ms at ~123
  Gexp/s — irreducible for exact softmax; MXU share is only ~0.9 ms).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench_zoo import chain_rate, host_init_bf16

B, H, T, hd = 8, 20, 1500, 64
D = H * hd
dt = jnp.bfloat16
SDPA_FLOPS = 2 * 2 * B * H * T * T * hd


def make_qkv():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(dt)
    k = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(dt)
    v = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(dt)
    mask = jnp.ones((B, T), jnp.float32)
    return q, k, v, mask


def bench_fn(fn, args, n_chain=10):
    """Chained timing with a carried dependency (no loop-invariant hoist)."""

    @jax.jit
    def chained(q, *rest):
        def body(i, q):
            o = fn(q, *rest)
            return q + (jnp.sum(o.astype(jnp.float32)) * 1e-12).astype(q.dtype)

        return jax.lax.fori_loop(0, n_chain, body, q)

    out = chained(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / n_chain


def isolated():
    from interspeech_ser_tpu.ops import attention_core as ac
    from interspeech_ser_tpu.ops.pallas import flash_attention_short as fas
    from interspeech_ser_tpu.ops.pallas.flash_attention import flash_attention

    q, k, v, mask = make_qkv()
    results = {}

    def run(name, fn):
        t = bench_fn(fn, (q, k, v, mask))
        results[name] = t
        print(f"SDPA {name:28s}: {t*1e3:7.3f} ms  ({SDPA_FLOPS/t/1e12:6.1f} TF/s)")

    run("xla", lambda q, k, v, m: ac.dot_product_attention_btd(
        q, k, v, H, key_mask=m, force_impl="xla"))

    # oneshot2: whichever branch the VMEM budget picks at this shape
    from interspeech_ser_tpu.ops.pallas.flash_attention_short import attention_btd
    bq = 512
    full_d = fas._VMEM_BUDGET >= (
        2 * 2 * (bq + T) * D * 2 + 8 * bq * T
    )
    print(f"[oneshot2 default branch at this shape: "
          f"{'full-D' if full_d else 'lane-blocked'}]")
    run("oneshot2 (default branch)", lambda q, k, v, m: attention_btd(
        q, k, v, H, key_mask=m))

    # force the other branch via the budget knob
    saved = fas._VMEM_BUDGET
    try:
        fas._VMEM_BUDGET = 1 if full_d else 512 * 2 ** 20
        other = "lane-blocked" if full_d else "full-D"
        run(f"oneshot2 ({other} forced)", lambda q, k, v, m: attention_btd(
            q, k, v, H, key_mask=m))
    except Exception as e:
        print(f"oneshot2 forced-other branch failed: {e}")
    finally:
        fas._VMEM_BUDGET = saved

    # recurrent flash (BHTD layout; isolated = no relayout cost)
    def bhtd(x):
        return x.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = bhtd(q), bhtd(k), bhtd(v)
    for bq_f, bk_f in ((256, 256), (512, 512), (128, 256), (512, 1536)):
        name = f"flash bq={bq_f} bk={bk_f}"
        try:
            t = bench_fn(
                lambda q, k, v, m, bq_=bq_f, bk_=bk_f: flash_attention(
                    q, k, v, key_mask=m, block_q=bq_, block_k=bk_),
                (qh, kh, vh, mask))
            results[name] = t
            print(f"SDPA {name:28s}: {t*1e3:7.3f} ms  ({SDPA_FLOPS/t/1e12:6.1f} TF/s)")
        except Exception as e:
            print(f"SDPA {name}: FAILED {type(e).__name__}: {e}")

    # parity spot check (flash vs xla, bf16 tolerance)
    o_x = ac.dot_product_attention_btd(q, k, v, H, key_mask=mask, force_impl="xla")
    o_f = flash_attention(qh, kh, vh, key_mask=mask).transpose(0, 2, 1, 3).reshape(B, T, D)
    err = float(jnp.max(jnp.abs(o_x.astype(jnp.float32) - o_f.astype(jnp.float32))))
    print(f"parity flash vs xla: maxdiff {err:.3e}")
    return results


def end_to_end():
    from interspeech_ser_tpu.models.whisper import (
        WhisperEncoderConfig, WhisperEncoderModel,
    )

    rng = np.random.default_rng(0)
    cfg = WhisperEncoderConfig(dtype="bfloat16", inference_kernels=True)
    model = WhisperEncoderModel(cfg)
    mel = jnp.asarray(
        rng.normal(size=(B, cfg.num_mel_bins, 3000)).astype(np.float32)
    )
    params = host_init_bf16(model, mel[:1])

    def fwd(p, m, _):
        return model.apply({"params": p}, m)["last_hidden_state"]

    for impl in (None, "oneshot2", "flash", "xla"):
        if impl is None:
            os.environ.pop("SER_TPU_ATTN_IMPL", None)
            label = "default"
        else:
            os.environ["SER_TPU_ATTN_IMPL"] = impl
            label = f"forced {impl}"
        try:
            rate = max(chain_rate(fwd, params, mel, None, B))
            print(f"e2e whisper encoder [{label:16s}]: {rate:.1f} windows/s (B={B})")
        except Exception as e:
            print(f"e2e whisper encoder [{label}]: FAILED {type(e).__name__}: {e}")
    os.environ.pop("SER_TPU_ATTN_IMPL", None)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    print("=== isolated SDPA, whisper shape ===")
    isolated()
    print("=== end-to-end whisper encoder ===")
    end_to_end()
