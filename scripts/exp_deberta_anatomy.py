#!/usr/bin/env python
"""DeBERTa-v2-xxl throughput anatomy: attribute the ~43% MFU residue.

Round-3 VERDICT item #4: after the one-hot select fix (4.2x), DeBERTa
extraction sits at 387 seq/s ≈ 84-98 TF/s. This script ablates the
disentangled branch in-context (full 48-layer model, B=32, T=80, bf16)
to locate the remaining non-GEMM cost:

  full        — shipping model
  no-select   — c2p/p2c einsums kept, one-hot selects skipped
                (adds the UN-gathered [.., :T] slice instead; wrong math,
                timing-only)
  no-branch   — content-only scores (whole disentangled branch off)
  gemm-only   — plus softmax replaced by a scale (timing skeleton)

FLOP model per layer at B=32 T=80 (D=1536, H=24, hd=64, 2S=512):
  projections 48.3 + MLP 96.6 GF (the GEMM core)
  c2p/p2c einsums 8.0 GF + one-hot selects ~10 GF + pos projections
  4.8 GF + content scores/PV 1.3 GF (the branch)

Run: python scripts/exp_deberta_anatomy.py

MEASURED (v5e bf16, r04):
  full 84.19 ms (380.1 seq/s) | no-select 92.74 (345.0 — slower: the
  timing-only [:T] slice forces a worse layout, not meaningful) |
  no-branch 60.36 (530.2) | gemm-only 61.40 (521.2 — softmax ~ free)
  → the disentangled branch is 23.8 ms = 28% of the forward, running at
  ~46 TF/s vs the GEMM core's 115 TF/s.

Attacks tried on the branch:
  1. WINDOW the c2p/p2c einsums to the reachable bucket range (~159 of
     512 at T=80): 380.1 → 395.4 seq/s (+4%) — SHIPPED
     (models/text.py, window slice on pos_k/pos_q).
  2. Toeplitz reformulation of the select (bucket depends only on q−k:
     one unbatched one-hot matmul over relative offsets + Music-
     Transformer pad/reshape skew, models/text._toeplitz_rel_select):
     243.9 vs 395.4 seq/s — NEGATIVE. The skew's lane-dim reshapes
     ([T,W]→flat→[T,L+1] + reverse) force full relayouts of the
     (8,128)-tiled tensors — a TPU anti-pattern that costs far more
     than the batched select it replaced. Kept as an exactness-tested
     experiment flag (SER_TPU_DEBERTA_TOEPLITZ=1).
CLOSED at 395.4 seq/s: the residual branch cost is the q-batched
select's layout handling plus ~19 GF/layer of small-shape einsums whose
operands (m=80 rows/batch) cannot fill the MXU; both are intrinsic to
DeBERTa's disentangled formulation at T=80, not kernel slack.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench_zoo import host_init_bf16  # noqa: E402  (scripts/ on path)

sys.path.insert(0, os.path.dirname(__file__))

B, T = 32, 80


def build(variant: str):
    import flax.linen as nn

    from interspeech_ser_tpu.models import text as tx

    cfg = tx.deberta_v2_xxlarge(dtype="bfloat16")

    class AblatedAttention(tx._DisentangledSelfAttention):
        @nn.compact
        def __call__(self, x, pair_mask, rel_embeddings):
            cfg_ = self.config
            D, H = cfg_.hidden_size, cfg_.num_heads
            hd = D // H
            dt = cfg_.compute_dtype
            Bq, Tq, _ = x.shape
            q_proj = nn.Dense(D, dtype=dt, param_dtype=jnp.float32, name="query_proj")
            k_proj = nn.Dense(D, dtype=dt, param_dtype=jnp.float32, name="key_proj")
            v_proj = nn.Dense(D, dtype=dt, param_dtype=jnp.float32, name="value_proj")
            heads = lambda y: y.reshape(Bq, Tq, H, hd).transpose(0, 2, 1, 3)
            q, k, v = heads(q_proj(x)), heads(k_proj(x)), heads(v_proj(x))
            scale = float(np.sqrt(hd * 3))
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k / scale, preferred_element_type=jnp.float32
            )
            if variant in ("full", "no-select"):
                span = cfg_.att_span
                rel = rel_embeddings[: span * 2].astype(dt)
                pos_k = k_proj(rel).reshape(2 * span, H, hd).transpose(1, 0, 2)
                pos_q = q_proj(rel).reshape(2 * span, H, hd).transpose(1, 0, 2)
                rel_pos = tx._log_bucket_positions(
                    Tq, cfg_.position_buckets, cfg_.max_position_embeddings
                )
                c2p = jnp.einsum("bhqd,hsd->bhqs", q, pos_k,
                                 preferred_element_type=jnp.float32)
                p2c = jnp.einsum("bhkd,hsd->bhks", k, pos_q,
                                 preferred_element_type=jnp.float32)
                if variant == "full":
                    c2p_g = tx._gather_last_static(
                        c2p, np.clip(rel_pos + span, 0, 2 * span - 1))
                    p2c_g = tx._gather_last_static(
                        p2c, np.clip(-rel_pos + span, 0, 2 * span - 1))
                else:  # timing-only: skip the selects, keep the einsums
                    c2p_g = c2p[..., :Tq]
                    p2c_g = p2c[..., :Tq]
                scores = scores + c2p_g / scale + jnp.swapaxes(p2c_g, -1, -2) / scale
            if variant == "gemm-only":
                weights = (scores * 1e-3).astype(dt)
            else:
                scores = jnp.where(pair_mask[:, None], scores, tx.NEG_INF)
                weights = jax.nn.softmax(scores, axis=-1).astype(dt)
            out = jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                             preferred_element_type=jnp.float32).astype(dt)
            return out.transpose(0, 2, 1, 3).reshape(Bq, Tq, D)

    # monkeypatch the attention class for this build
    orig = tx._DisentangledSelfAttention
    tx._DisentangledSelfAttention = AblatedAttention
    try:
        model = tx.DebertaV2Model(cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(5, 1000, size=(B, T)))
        mask = jnp.ones((B, T), jnp.float32)
        params = host_init_bf16(model, ids[:1], mask[:1])
    finally:
        tx._DisentangledSelfAttention = orig
    return model, params, ids, mask, AblatedAttention, tx


def bench(variant, n_chain=6):
    model, params, ids, mask, cls, tx = build(variant)
    orig = tx._DisentangledSelfAttention
    tx._DisentangledSelfAttention = cls
    try:
        @jax.jit
        def chained(params, ids, mask):
            def body(i, m):
                out = model.apply({"params": params}, ids, m)["last_hidden_state"]
                return m + (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(m.dtype)
            return jax.lax.fori_loop(0, n_chain, body, mask)

        out = chained(params, ids, mask)
        float(jnp.sum(out.astype(jnp.float32)))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = chained(params, ids, mask)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
    finally:
        tx._DisentangledSelfAttention = orig
    t = best / n_chain
    print(f"{variant:12s}: {t*1e3:7.2f} ms/fwd  ({B/t:7.1f} seq/s)")
    return t


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    for v in ("full", "no-select", "no-branch", "gemm-only"):
        bench(v)
