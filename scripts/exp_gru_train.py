#!/usr/bin/env python
"""Fused-GRU TRAINING path A/B on v5e (VERDICT r02 #6).

The fusion train step was GRU-latency-bound: 29.7 ms/step at bs64 after
the unroll=8 scan fix. The Pallas sequential-grid GRU kernel now carries
a custom_vjp (forward = kernel with VMEM-resident recurrent weights,
backward = hand-derived reverse scan recomputing gates from the emitted
carries). This measures the full production train step (fwd + bwd +
AdamW) scan vs kernel at production shapes (whisper 1280 T512 + roberta
1024 T80, bs 64), ragged masks.

MEASURED RESULTS (v5e):
- r03a: scan 29.9 ms/step vs kernel-fwd + hand-SCAN-bwd 31.0 (0.97x —
  negative; the hand bwd re-derives gates the autodiff scan gets as
  saved residuals). A whole-sequence-MXU hoist was worse still (40.1 ms
  — [T,2,B,3H] f32 coefficient HBM round-trips).
- r03b: the vjp backward became a sequential-grid Pallas kernel
  (reverse time, weights + dW/db accumulators VMEM-resident —
  pallas/gru_kernel._kernel_bidir_bwd) but FAILED TO COMPILE on chip:
  the resident whh input block + dW accumulator output (f32 [2,512,1536]
  = 6.3 MB each) overflow the compiler's default 16 MiB scoped-vmem
  limit by 520 KiB at the production text-GRU shape (B2=128, H=512).
- r03c: with the kernel's scoped-vmem limit raised (CompilerParams,
  like the attention kernels): **kernel pair 25.99 ms/step vs scan
  29.72 (1.143x)** — the kernel pair is now the TRAINING default on
  single-device TPU (engine._use_gru_kernel(training=True); multi-device
  training rides jit+GSPMD where a Pallas call does not partition).
  First-step loss delta 2.8e-4 (f32 gate recompute noise). Gradient
  parity: tests/test_gru_kernel.py (params + inputs + masked-frame
  zeroing).

Steps chain through params (data-dependent), so no XLA loop hoisting —
timed with scalar readbacks (tunnel-safe).
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


def bench(use_kernel: bool, n=20):
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


t_scan, l0_s, ln_s = bench(False)
print(f"train step scan  : {t_scan*1e3:6.2f} ms/step  "
      f"(loss {l0_s:.4f} -> {ln_s:.4f})", flush=True)
t_ker, l0_k, ln_k = bench(True)
print(f"train step kernel: {t_ker*1e3:6.2f} ms/step  "
      f"(loss {l0_k:.4f} -> {ln_k:.4f})", flush=True)
print(f"speedup {t_scan/t_ker:.3f}x ; first-step loss delta "
      f"{abs(l0_s-l0_k):.2e} (should be ~bf16/f32 noise)", flush=True)
