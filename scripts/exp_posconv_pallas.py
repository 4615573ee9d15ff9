#!/usr/bin/env python
"""Parity + timing: Pallas pos-conv kernel vs XLA grouped conv."""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from interspeech_ser_tpu.ops.pallas.pos_conv import pos_conv_grouped

B, T, D, G, K = int(os.environ.get("B", 16)), 499, 1024, 16, 128
dt = jnp.bfloat16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(dt)
kernel = jnp.asarray((rng.normal(size=(K, 64, D)) * 0.02).astype(np.float32))


def xla_ref(x, kernel):
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1,), [(64, 64)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=G, preferred_element_type=x.dtype,
    )
    return y


ref = jax.jit(xla_ref)(x, kernel)
ours = pos_conv_grouped(x, kernel.astype(dt))
print("shapes", ref.shape, ours.shape)
err = float(jnp.max(jnp.abs(ours.astype(jnp.float32) - ref.astype(jnp.float32))))
scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
print(f"max abs err {err:.5f} (scale {scale:.3f})")


def chain_time(fn, *args, n_chain=10):
    @jax.jit
    def chained(x, *rest):
        def body(i, x):
            y = fn(x, *rest)
            return x + (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(x.dtype)
        return jax.lax.fori_loop(0, n_chain, body, x)
    out = chained(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = chained(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / n_chain


gf = 2 * B * (T + 1) * D * K * 64 / 1e9
t_xla = chain_time(xla_ref, x, kernel)
t_pl = chain_time(lambda x, k: pos_conv_grouped(x, k.astype(dt)), x, kernel)
print(f"XLA grouped conv: {t_xla*1e3:.3f} ms ({gf/t_xla/1e3:.0f} TF/s)")
print(f"Pallas kernel:    {t_pl*1e3:.3f} ms ({gf/t_pl/1e3:.0f} TF/s)")
