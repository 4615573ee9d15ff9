#!/usr/bin/env python
"""TPU installation smoke check: devices, jit, flagship compile, tiny extraction.

Run on a fresh TPU VM (or this image) to confirm the framework is wired:
    python scripts/smoke_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    t0 = time.perf_counter()
    x = jnp.ones((256, 256))
    y = jax.jit(lambda a: a @ a)(x)
    print(f"jit matmul ok ({float(y[0, 0]):.0f}) in {time.perf_counter() - t0:.1f}s")

    import __graft_entry__ as ge

    t0 = time.perf_counter()
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    val = float(np.asarray(out[0, 0, 0]))
    print(
        f"flagship (WavLM-large fwd) ok: out {out.shape}, sample {val:.4f}, "
        f"{time.perf_counter() - t0:.1f}s incl. compile"
    )

    n = min(8, len(jax.devices()))
    ge.dryrun_multichip(n)
    print("smoke check passed")


if __name__ == "__main__":
    main()
