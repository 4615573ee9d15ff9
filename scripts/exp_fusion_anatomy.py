#!/usr/bin/env python
"""Fusion train-step anatomy: where do the 26 ms/step go?

After the GRU kernel pair became the training default (25.99 ms/step at
production bs64, scripts/exp_gru_train.py r03c), this isolates the GRU
share to decide whether a K-step-unrolled grid (fewer, fatter grid
iterations amortizing per-step fixed cost) has enough headroom to build.

Measures, at production shapes (whisper 1280/T512 + roberta 1024/T80,
bs64, fusion hidden 512):
  a) full train step, kernel pair        (the shipping default)
  b) full train step, lax.scan           (the old default)
  c) isolated GRU fwd+bwd, speech shapes (kernel pair vs scan)
  d) isolated GRU fwd+bwd, text shapes   (kernel pair vs scan)

Chained-dependency timing (tunnel-safe).

MEASURED (v5e, r03):
- isolated GRU pair T512: scan 16.0 ms; kernel K=1 7.47; kernel K=8
  grid-unroll (fwd+bwd) 7.25 — the unroll is a consistent ~3% and ships
  as the default, but the serial dependency chain (not grid overhead)
  is the bound, so deeper unrolls have nothing left to amortize.
- full step: scan 29.7; kernel pair 25.9 (K=8) vs 26.1 (K=1).
- bf16_compute=True (params+features cast bf16 inside the loss, f32
  master params/loss): 24.95 vs 26.14 ms — only 1.05x, NEGATIVE as a
  numerics-changing mode. XLA's default-precision f32 dots already ride
  the MXU via bf16 passes, and the step is recurrence/small-op bound,
  so mixed precision has no meaningful GEMM share to win. Not shipped.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


from interspeech_ser_tpu.ops.pallas.gru_kernel import gru_bidir_carries

B, H = 64, 512


def time_fn(fn, *args, n=20, reps=3):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def gru_pair_time(T, use_kernel):
    """fwd+bwd of the bidirectional GRU recurrence at [2B, T, 3H]."""
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(size=(2 * B, T, 3 * H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, H, 3 * H)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(2, 3 * H)).astype(np.float32) * 0.05)
    m = np.ones((2 * B, T), np.float32)
    for i, l in enumerate(rng.integers(T // 2, T, size=2 * B)):
        m[i, l:] = 0
    m = jnp.asarray(m)

    if use_kernel:
        def loss(xp, w, b):
            h = gru_bidir_carries(xp, w, b, m, None)
            return jnp.sum(h * m[:, :, None])
    else:
        def one_dir(xp_d, w_d, b_d, m_d):
            # inline recurrence over precomputed projections (the scan
            # path's per-step math, autodiff backward)
            xs = jnp.swapaxes(xp_d, 0, 1)  # [T, B, 3H]
            ms = jnp.swapaxes(m_d, 0, 1)[:, :, None]

            def stepf(h, inp):
                xp_t, m_t = inp
                hp = h @ w_d + b_d
                r = jax.nn.sigmoid(xp_t[:, :H] + hp[:, :H])
                z = jax.nn.sigmoid(xp_t[:, H:2 * H] + hp[:, H:2 * H])
                n = jnp.tanh(xp_t[:, 2 * H:] + r * hp[:, 2 * H:])
                h_new = (1 - z) * n + z * h
                h_next = m_t * h_new + (1 - m_t) * h
                return h_next, h_next * m_t

            _, out = jax.lax.scan(
                stepf, jnp.zeros((xp_d.shape[0], H), jnp.float32), (xs, ms),
                unroll=8,
            )
            return out

        def loss(xp, w, b):
            fwd = one_dir(xp[:B], w[0], b[0], m[:B])
            bwd = one_dir(xp[B:], w[1], b[1], m[B:])
            return jnp.sum(fwd) + jnp.sum(bwd)

    def scalar_grads(xp, w, b):
        # reduce every cotangent on-device: a [2B,T,3H] dxp readback over
        # the tunnel costs ~600 ms and would swamp the measurement
        gs = jax.grad(loss, argnums=(0, 1, 2))(xp, w, b)
        return sum(jnp.sum(g_.astype(jnp.float32)) for g_ in gs)

    g = jax.jit(scalar_grads)
    return time_fn(g, xp, w, b)


def full_step_time(use_kernel, bf16_compute=False):
    """Production fusion train step; ``bf16_compute=True`` casts params
    and features to bf16 inside the loss (master params + optimizer stay
    f32, loss in f32) — measures the mixed-precision headroom of the
    non-GRU GEMM share (MXU runs f32 at 1/4 bf16 rate)."""
    import optax

    from interspeech_ser_tpu.models.fusion import MultiModalEmotionClassifier

    rng = np.random.default_rng(0)
    model = MultiModalEmotionClassifier(feat_dims=(1280, 1024))
    T1, T2 = 512, 80
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
    params = model.init(
        jax.random.PRNGKey(0), [f1[:1], f2[:1]], masks=[m1[:1], m2[:1]],
        deterministic=True,
    )["params"]
    tx = optax.adamw(1e-4, weight_decay=1e-6)
    opt_state = tx.init(params)
    dkey = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            if bf16_compute:
                p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
                x1, x2 = f1.astype(jnp.bfloat16), f2.astype(jnp.bfloat16)
            else:
                x1, x2 = f1, f2
            logits = model.apply(
                {"params": p}, [x1, x2], masks=[m1, m2], deterministic=False,
                rngs={"dropout": dkey}, use_gru_kernel=use_kernel,
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], -1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p, o = params, opt_state
    p, o, l = step(p, o)
    float(l)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            p, o, l = step(p, o)
        float(l)
        best = min(best, (time.perf_counter() - t0) / 20)
    return best


if __name__ == "__main__":
    for name, fn in [
        ("full step  kernel", lambda: full_step_time(True)),
        ("full step  scan  ", lambda: full_step_time(False)),
        ("gru T512   kernel", lambda: gru_pair_time(512, True)),
        ("gru T512   scan  ", lambda: gru_pair_time(512, False)),
        ("gru T80    kernel", lambda: gru_pair_time(80, True)),
        ("gru T80    scan  ", lambda: gru_pair_time(80, False)),
    ]:
        print(f"{name}: {fn()*1e3:7.2f} ms", flush=True)
