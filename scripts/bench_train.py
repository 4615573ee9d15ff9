#!/usr/bin/env python
"""Training-step throughput on the real chip.

Two hot training paths (SURVEY.md §3.2/§3.5):
1. Baseline end-to-end WavLM-large fine-tune (benchmark/run_cat.sh
   envelope: micro-batch 8, 12-s capped audio, frozen conv frontend):
   fwd+bwd+AdamW per micro-batch, reported as audio-seconds trained per
   wall second.
2. Lazy-fusion trainer at production dims (whisper 1280 + roberta 1024,
   bs 64): jitted device step time (the host .pt loads overlap via
   PrefetchLoader in real runs).

Random weights; chained timing like bench.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax


def bench_baseline(n_rep=2):
    from interspeech_ser_tpu.models.speech import SpeechEncoderModel, wavlm_large
    from interspeech_ser_tpu.baseline.models import AttentiveStatisticsPooling, EmotionRegression

    cfg = wavlm_large(dtype="bfloat16")
    enc = SpeechEncoderModel(cfg)
    pool = AttentiveStatisticsPooling(cfg.hidden_size)
    head = EmotionRegression(2 * cfg.hidden_size, 1024, 1, 8)
    B, L = 8, 16000 * 12
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32) * 0.1)
    mask = jnp.ones((B, L), jnp.float32)
    y = jnp.asarray(rng.integers(0, 8, size=B))

    kp = jax.random.PRNGKey(0)
    p_enc = enc.init(kp, wav[:1], mask[:1])["params"]
    feat = enc.apply({"params": p_enc}, wav[:1], mask[:1])
    h0 = feat["last_hidden_state"]
    p_pool = pool.init(kp, h0, mask[:1])["params"]
    pooled0 = pool.apply({"params": p_pool}, h0, mask[:1])
    p_head = head.init(kp, pooled0, deterministic=True)["params"]
    params = {"enc": p_enc, "pool": p_pool, "head": p_head}
    tx = optax.adamw(1e-5, weight_decay=0.0)
    opt_state = tx.init(params)

    def loss_fn(p, wav, mask, y, dkey):
        out = enc.apply(
            {"params": p["enc"]}, wav, mask, freeze_feature_extractor=True
        )
        pooled = pool.apply({"params": p["pool"]}, out["last_hidden_state"], mask)
        logits = head.apply(
            {"params": p["head"]}, pooled, deterministic=False,
            rngs={"dropout": dkey},
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], -1))

    @jax.jit
    def step(params, opt_state, wav, mask, y, dkey):
        loss, grads = jax.value_and_grad(loss_fn)(params, wav, mask, y, dkey)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    dkey = jax.random.PRNGKey(1)
    params, opt_state, loss = step(params, opt_state, wav, mask, y, dkey)
    float(loss)
    n = 8
    rates = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt_state, loss = step(params, opt_state, wav, mask, y, dkey)
        float(loss)
        dt = (time.perf_counter() - t0) / n
        rates.append(B * 12.0 / dt)
    best_dt_ms = B * 12.0 / max(rates) * 1e3
    print(
        f"baseline e2e WavLM-large fine-tune: {best_dt_ms:.1f} ms/micro-step "
        f"(B={B}, 12-s) = {max(rates):.0f} audio-s trained per wall-s"
    )
    return rates


def bench_fusion(n_rep=2):
    from interspeech_ser_tpu.models.fusion import MultiModalEmotionClassifier

    model = MultiModalEmotionClassifier(feat_dims=(1280, 1024))
    B, T1, T2 = 64, 512, 80
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.normal(size=(B, T1, 1280)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(B, T2, 1024)).astype(np.float32))
    m1 = jnp.ones((B, T1), jnp.float32)
    m2 = jnp.ones((B, T2), jnp.float32)
    y = jnp.asarray(rng.integers(0, 8, size=B))
    params = model.init(
        jax.random.PRNGKey(0), [f1[:1], f2[:1]], masks=[m1[:1], m2[:1]],
        deterministic=True,
    )["params"]
    tx = optax.adamw(1e-4, weight_decay=1e-6)
    opt_state = tx.init(params)

    # measure the PRODUCTION training path: FusionEngine engages the
    # Pallas GRU kernel pair on TPU (train/engine.py:_use_gru_kernel,
    # 25.99 vs 29.72 ms/step scan). Building the model directly here had
    # silently measured the scan path — caught by bench_suite's r04→r05
    # comparator flagging a +13% "regression" that was really this bench
    # timing the wrong branch.
    use_kernel = jax.default_backend() == "tpu"

    def loss_fn(p, dkey):
        logits = model.apply(
            {"params": p}, [f1, f2], masks=[m1, m2], deterministic=False,
            rngs={"dropout": dkey}, use_gru_kernel=use_kernel,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], -1))

    @jax.jit
    def step(params, opt_state, dkey):
        loss, grads = jax.value_and_grad(loss_fn)(params, dkey)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    dkey = jax.random.PRNGKey(1)
    params, opt_state, loss = step(params, opt_state, dkey)
    float(loss)
    n = 20
    ms = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt_state, loss = step(params, opt_state, dkey)
        float(loss)
        ms.append((time.perf_counter() - t0) / n * 1e3)
    print(
        f"fusion trainer (whisper1280+roberta1024, bs64): {min(ms):.1f} ms/step "
        f"= {B/min(ms)*1e3:.0f} samples/s device-side"
    )
    return ms


if __name__ == "__main__":
    which = sys.argv[1:] or ["fusion", "baseline"]
    if "fusion" in which:
        bench_fusion()
    if "baseline" in which:
        bench_baseline()
