#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Round-1 benchmark: full fusion training-step throughput (utterances/sec)
on one TPU chip at the reference's production shape — bimodal
whisper-large-v3 (1280-d, ~10 s ≈ 512 frames) × roberta-large (1024-d,
96 tokens), batch 64, weighted CE, AdamW — i.e. the hot loop of
bin/train_cat_bimodal_lazy_1head.py (reference L405-433).

``vs_baseline`` compares against an estimated 400 utt/s for the reference's
A100 PyTorch fusion hot loop (compute-bound cuDNN-GRU estimate; the actual
reference path is I/O bound far below this — see BASELINE.md). This will be
replaced by the SSL-extraction benchmark (BASELINE.json headline metric)
once the encoder zoo lands.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from interspeech_ser_tpu.models.fusion import MultiModalEmotionClassifier
from interspeech_ser_tpu.train.losses import weighted_cross_entropy

BASELINE_FUSION_UTT_PER_SEC = 400.0  # estimated A100 torch compute-bound rate

BATCH, T1, T2 = 64, 512, 96
FEAT_DIMS = (1280, 1024)


def main():
    model = MultiModalEmotionClassifier(feat_dims=FEAT_DIMS, fusion_hidden_dim=512)
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.normal(size=(BATCH, t, d)).astype(np.float32))
        for t, d in zip((T1, T2), FEAT_DIMS)
    ]
    masks = [jnp.ones((BATCH, t), jnp.float32) for t in (T1, T2)]
    labels = jnp.asarray(rng.integers(0, 8, BATCH))
    params = model.init(jax.random.PRNGKey(0), feats, masks=masks)["params"]
    tx = optax.adamw(1e-5, weight_decay=1e-6)
    opt_state = tx.init(params)
    dropout_key = jax.random.PRNGKey(1)

    def train_step(params, opt_state, feats, masks, labels, dkey):
        def loss_fn(p):
            logits = model.apply(
                {"params": p}, feats, masks=masks, deterministic=False,
                rngs={"dropout": dkey},
            )
            return weighted_cross_entropy(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))

    # warmup / compile (float() forces a real readback: block_until_ready
    # can return early under the tunneled remote-execution runtime)
    for i in range(3):
        params, opt_state, loss = step(
            params, opt_state, feats, masks, labels, jax.random.fold_in(dropout_key, i)
        )
    float(loss)

    def timed(n, offset):
        nonlocal params, opt_state
        t0 = time.perf_counter()
        loss = None
        for i in range(n):
            params, opt_state, loss = step(
                params, opt_state, feats, masks, labels,
                jax.random.fold_in(dropout_key, offset + i),
            )
        float(loss)  # data-dependent readback of the whole chain
        return time.perf_counter() - t0

    # slope method: cancels the fixed dispatch/tunnel round-trip latency
    n1, n2 = 10, 40
    t1 = timed(n1, 100)
    t2 = timed(n2, 200)
    per_step = (t2 - t1) / (n2 - n1)
    utt_per_sec = BATCH / per_step
    print(
        json.dumps(
            {
                "metric": "fusion_train_utterances_per_sec",
                "value": round(utt_per_sec, 2),
                "unit": "utt/s/chip",
                "vs_baseline": round(utt_per_sec / BASELINE_FUSION_UTT_PER_SEC, 3),
                "device": str(jax.devices()[0]),
                "note": "bimodal whisper+roberta train step, bs64 T512/T96; baseline=400 utt/s A100 estimate",
            }
        )
    )


if __name__ == "__main__":
    main()
