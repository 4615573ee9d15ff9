#!/usr/bin/env python
"""Fused-FFN Pallas pair vs XLA at the stack's exact MLP shape.

VERDICT r04's last untried MXU angle: exp_gemm_roofline.py showed the
MLP pair [19168,1024]×[1024,4096]→[4096,1024] runs 154 TF/s under XLA
while giant squares reach 178 — is the gap the shape, or the HBM
round-trip of the [M,4096] intermediate between XLA's two GEMMs? The
kernel (ops/pallas/ffn_fused.py) keeps the intermediate VMEM-resident;
this script A/Bs isolated pair time (several block_m) and, via the
SER_TPU_FFN_KERNEL=1 opt-in, e2e WavLM extraction.

Run on the real chip:  python scripts/exp_ffn_fused.py [iso|e2e]

MEASURED (v5e, bf16, 2026-08-20, pure serial chain — output feeds input,
zero glue; a first attempt with scalar-fold glue measured everything at
~75 TF/s, glue-dominated, matching exp_gemm_roofline.py's warning):

  xla bare pair                2.125 ms   151.3 TF/s  (reproduces the 154)
  xla + bias + gelu epilogue   2.138 ms   150.4 TF/s  <- epilogue is FREE
  fused kernel bm=256          2.258 ms   142.4 TF/s
  fused kernel bm=512          2.210 ms   145.5 TF/s  <- best, still -3%
  fused kernel bm=1024         2.428 ms   132.5 TF/s
  e2e WavLM extraction flag on vs off: see STATUS (negative)

CONCLUSION — NEGATIVE, closes the last MXU angle: the [M,4096]
intermediate's HBM round-trip (~314 MB) is fully overlapped with the
2.1 ms of MXU work at this shape, so keeping it VMEM-resident buys
nothing, and Mosaic's pipelining sits ~3% behind XLA's at equal math.
The 154-vs-178 TF/s gap is intrinsic GEMM efficiency at K=N=1024, not
reclaimable traffic. SER_TPU_FFN_KERNEL stays a zero-default opt-in.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

M, K, F = 19168, 1024, 4096  # exp_gemm_roofline.py's MLP-pair shape
PAIR_TFLOP = 2 * 2 * M * K * F / 1e12


def _chain(fn, args, n=60):
    """Pure serial chain: the pair's [M,K] output IS the next input —
    zero glue. (The scalar-fold variant used elsewhere adds a full-tensor
    sum + broadcast update per iteration, which dominates at this ~2 ms
    op size and buried the first A/B at ~75 TF/s across the board.)"""

    @jax.jit
    def chained(x, *rest):
        return jax.lax.fori_loop(0, n, lambda i, x: fn(x, *rest), x)

    out = chained(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / n


def iso():
    from interspeech_ser_tpu.ops.pallas.ffn_fused import ffn_fused

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
    wu = jnp.asarray(rng.normal(size=(K, F)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    bu = jnp.asarray(rng.normal(size=(F,)).astype(np.float32))
    wd = jnp.asarray(rng.normal(size=(F, K)).astype(np.float32) * 0.02).astype(jnp.bfloat16)
    bd = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))

    def xla_pair(x, wu, bu, wd, bd):
        h = jnp.dot(x, wu, preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h + bu, approximate=True).astype(x.dtype)
        return (jnp.dot(h, wd, preferred_element_type=jnp.float32) + bd).astype(x.dtype)

    t = _chain(xla_pair, (x, wu, bu, wd, bd))
    print(f"xla pair:          {t*1e3:7.2f} ms  {PAIR_TFLOP/t:6.1f} TF/s")

    # parity once (bf16 tolerance)
    ref = np.asarray(xla_pair(x, wu, bu, wd, bd), np.float32)
    for bm in (256, 512, 1024, 2048):
        def kfn(x, wu, bu, wd, bd, bm=bm):
            return ffn_fused(x, wu, bu, wd, bd, block_m=bm)

        try:
            got = np.asarray(kfn(x, wu, bu, wd, bd), np.float32)
            denom = np.maximum(np.abs(ref), 1.0)
            md = float(np.max(np.abs(got - ref) / denom))
            t = _chain(kfn, (x, wu, bu, wd, bd))
            print(f"fused bm={bm:4d}:    {t*1e3:7.2f} ms  {PAIR_TFLOP/t:6.1f} TF/s"
                  f"  (rel maxdiff {md:.2e})")
        except Exception as e:
            print(f"fused bm={bm:4d}:    FAILED {type(e).__name__}: {e}")


def e2e():
    """WavLM-large extraction throughput with the kernel flag on vs off."""
    import scripts.bench_zoo as z

    from interspeech_ser_tpu.models.speech import wavlm_large

    for flag in ("0", "1"):
        os.environ["SER_TPU_FFN_KERNEL"] = flag
        rates = z.bench_speech(f"wavlm(ffn_kernel={flag})", wavlm_large, 32, n_rep=3)
        print(f"  -> best {max(rates):.1f} utt/s")


if __name__ == "__main__":
    which = sys.argv[1:] or ["iso"]
    if "iso" in which:
        iso()
    if "e2e" in which:
        e2e()
