#!/usr/bin/env python
"""Direction-stacked GRU scan A/B on the production fusion train step.

The fusion trainer is GRU-latency-bound (29.9 ms/step at bs64; STATUS).
Each BiGRU currently runs its two directions as two *serial* lax.scans —
XLA schedules one op at a time per TPU core, so the recurrence pays 2T
sequential steps per GRU. ``gru_scan_bidir_stacked`` (ops/gru.py) stacks
the directions on a leading [2] dim (backward inputs pre-reversed) and
runs ONE scan: T steps, each doing both directions' small matmuls
batched on the MXU. Same math (equality + gradient tests in
tests/test_ops_parity.py), differentiable, GSPMD-safe — if it wins it
can simply become the default, unlike the Pallas kernel paths.

Measures the full production train step (fwd+bwd+AdamW, whisper 1280
T512 + roberta 1024 T80, bs64, ragged masks) with SER_TPU_GRU_STACK
off/on. Numeric guard: first-step losses must agree to ~1e-5.

Run: python scripts/exp_gru_stack.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from interspeech_ser_tpu.models.fusion import MultiModalEmotionClassifier

B, T1, T2 = 64, 512, 80
rng = np.random.default_rng(0)
model = MultiModalEmotionClassifier(feat_dims=(1280, 1024))
f1 = jnp.asarray(rng.normal(size=(B, T1, 1280)).astype(np.float32))
f2 = jnp.asarray(rng.normal(size=(B, T2, 1024)).astype(np.float32))
m1 = np.ones((B, T1), np.float32)
m2 = np.ones((B, T2), np.float32)
for i, l in enumerate(rng.integers(T1 // 2, T1, size=B)):
    m1[i, l:] = 0
for i, l in enumerate(rng.integers(T2 // 2, T2, size=B)):
    m2[i, l:] = 0
m1, m2 = jnp.asarray(m1), jnp.asarray(m2)
y = jnp.asarray(rng.integers(0, 8, size=B))
params0 = model.init(
    jax.random.PRNGKey(0), [f1[:1], f2[:1]], masks=[m1[:1], m2[:1]],
    deterministic=True,
)["params"]
tx = optax.adamw(1e-4, weight_decay=1e-6)


def bench(stacked: bool, n=20):
    if stacked:
        os.environ["SER_TPU_GRU_STACK"] = "1"
    else:
        os.environ.pop("SER_TPU_GRU_STACK", None)

    def loss_fn(p, dkey):
        logits = model.apply(
            {"params": p}, [f1, f2], masks=[m1, m2], deterministic=False,
            rngs={"dropout": dkey},
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], -1))

    @jax.jit
    def step(params, opt_state, dkey):
        loss, grads = jax.value_and_grad(loss_fn)(params, dkey)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state = params0, tx.init(params0)
    dkey = jax.random.PRNGKey(1)
    params, opt_state, loss = step(params, opt_state, dkey)
    l0 = float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            params, opt_state, loss = step(params, opt_state, dkey)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / n)
    return best, l0, float(loss)


t_two, l0_a, ln_a = bench(False)
print(f"train step 2-scan : {t_two*1e3:6.2f} ms/step  "
      f"(loss {l0_a:.4f} -> {ln_a:.4f})", flush=True)
t_stk, l0_b, ln_b = bench(True)
print(f"train step stacked: {t_stk*1e3:6.2f} ms/step  "
      f"(loss {l0_b:.4f} -> {ln_b:.4f})", flush=True)
guard = abs(l0_a - l0_b)
print(f"speedup {t_two/t_stk:.3f}x ; first-step loss delta {guard:.2e} "
      f"{'OK' if guard < 1e-4 else 'NUMERIC GUARD FAIL'}", flush=True)
