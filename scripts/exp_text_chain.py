#!/usr/bin/env python
"""Audit the text-zoo timing chain for loop-invariant hoisting.

``bench_zoo.bench_text``'s original chain accumulated only a scalar —
the forward did not depend on the loop carry, so XLA's while-loop
invariant code motion could legally evaluate ONE forward and reuse the
scalar 6 times, inflating seq/s by up to 6x. The speech/whisper chains
fold the output back into the waveform (true serial dependency) and are
not at risk.

This script measures, for roberta-large and deberta-v2-xxl at a given
batch/seq:
  acc   — the original accumulate-only chain at n and 2n iterations
          (if 2n is NOT ~2x slower, the forward was hoisted);
  serial — a dependency-carrying chain (delta folded into the attention
          mask, +1e-12 * sum: numerically invisible, semantically a
          real dependency) at n and 2n.
Reports per-forward ms for each and the implied honest seq/s.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from scripts.bench_zoo import _roberta, _deberta  # noqa: E402


def time_chain(fn, *args):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def run(name, builder, batch, seq):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 1000, size=(batch, seq)))
    mask = jnp.ones((batch, seq), jnp.float32)
    model, params = builder()

    def fwd(p, i, m):
        return model.apply({"params": p}, i, m)["last_hidden_state"]

    def acc_chain(n):
        @jax.jit
        def chained(params, ids, mask):
            def body(i, acc):
                out = fwd(params, ids, mask)
                return acc + jnp.sum(out.astype(jnp.float32)) * 1e-12
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return chained

    def serial_chain(n):
        @jax.jit
        def chained(params, ids, mask):
            def body(i, m):
                out = fwd(params, ids, m)
                delta = jnp.sum(out.astype(jnp.float32)) * 1e-12
                return m + delta
            return jax.lax.fori_loop(0, n, body, mask)
        return chained

    res = {}
    for label, mk in [("acc", acc_chain), ("serial", serial_chain)]:
        t1 = time_chain(mk(6), params, ids, mask)
        t2 = time_chain(mk(12), params, ids, mask)
        # slope: marginal cost of 6 extra iterations -> per-forward time
        per_fwd = (t2 - t1) / 6
        res[label] = (t1, t2, per_fwd)
        print(
            f"{name} B={batch} {label:6s}: n6 {t1*1e3:8.1f} ms  n12 {t2*1e3:8.1f} ms  "
            f"slope {per_fwd*1e3:7.2f} ms/fwd  -> {batch/max(per_fwd,1e-9):8.1f} seq/s",
            flush=True,
        )
    hoisted = res["acc"][1] < 1.5 * res["acc"][0] and res["serial"][2] > 2 * (
        (res["acc"][1] - res["acc"][0]) / 6
    )
    print(f"{name} B={batch}: hoisting detected = {hoisted}", flush=True)


if __name__ == "__main__":
    fams = sys.argv[1:] or ["roberta:64", "deberta:32"]
    for f in fams:
        fam, _, b = f.partition(":")
        batch = int(b) if b else {"roberta": 64, "deberta": 32}[fam]
        if fam == "roberta":
            run("roberta-large", _roberta, batch, 80)
        else:
            run("deberta-v2-xxl", _deberta, batch, 80)
