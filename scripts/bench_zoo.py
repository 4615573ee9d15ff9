#!/usr/bin/env python
"""Extraction throughput for every production encoder on one chip.

Chained-dispatch timing (same method as bench.py) at each encoder's card
architecture with random weights, bf16 compute. Prints one line per model;
record the table in STATUS.

Run:  python scripts/bench_zoo.py [families...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

SECONDS = 10.0


def host_init_bf16(model, *init_args):
    """Random bf16 params WITHOUT a device-side init compile.

    ``model.init`` at whisper/hubert card size compiles a full init
    program — many minutes over this image's remote-compile tunnel (it
    cost r03 its first zoo-re-bench window). ``jax.eval_shape`` traces
    the same init without compiling anything; the leaves are then filled
    host-side with numpy and shipped to the device as plain data. The
    benchmark only needs *some* finite weights (layernorms keep random
    stacks numerically tame), so distribution fidelity is irrelevant.
    """
    import jax.random as jrandom

    shapes = jax.eval_shape(
        lambda: model.init(jrandom.PRNGKey(0), *init_args)
    )["params"]
    rng = np.random.default_rng(0)

    def fill(s):
        a = rng.normal(size=s.shape).astype(np.float32) * 0.02
        return jnp.asarray(a, jnp.bfloat16)

    return jax.tree.map(fill, shapes)


def chain_rate(fwd, params, x, extra, batch, n_chain=6, n_rep=2):
    """→ list of per-repeat throughputs (len n_rep; compile excluded).
    Callers report max() as the value and the spread as the noise band
    (bench_suite.py records both)."""

    @jax.jit
    def chained(params, x, extra):
        def body(i, x):
            out = fwd(params, x, extra)
            delta = jnp.sum(out.astype(jnp.float32)) * 1e-12
            return x + delta.astype(x.dtype)

        return jax.lax.fori_loop(0, n_chain, body, x)

    out = chained(params, x, extra)
    float(jnp.sum(out.astype(jnp.float32)))
    rates = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = chained(params, x, extra)
        float(jnp.sum(out.astype(jnp.float32)))
        rates.append(batch * n_chain / (time.perf_counter() - t0))
    return rates


def bench_speech(name, cfg_fn, batch, n_rep=2):
    import dataclasses

    from interspeech_ser_tpu.models.speech import (
        SpeechEncoderModel,
        default_fused_frontend,
    )

    cfg = dataclasses.replace(cfg_fn(dtype="bfloat16"), inference_kernels=True)
    model = SpeechEncoderModel(cfg, fused_frontend=default_fused_frontend(cfg))
    rng = np.random.default_rng(0)
    T = int(16000 * SECONDS)
    wav = jnp.asarray(rng.normal(size=(batch, T)).astype(np.float32))
    mask = jnp.ones((batch, T), jnp.float32)
    params = host_init_bf16(model, wav[:1], mask[:1])

    def fwd(p, w, m):
        return model.apply({"params": p}, w, m)["last_hidden_state"]

    rates = chain_rate(fwd, params, wav, mask, batch, n_rep=n_rep)
    print(f"{name}: {max(rates):.1f} utt/s/chip (B={batch}, 10-s utts)")
    return rates


def bench_whisper(batch, n_rep=2):
    from interspeech_ser_tpu.models.whisper import WhisperEncoderConfig, WhisperEncoderModel

    cfg = WhisperEncoderConfig(dtype="bfloat16", inference_kernels=True)
    model = WhisperEncoderModel(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(batch, cfg.num_mel_bins, 3000)).astype(np.float32))
    params = host_init_bf16(model, mel[:1])

    def fwd(p, m, _):
        return model.apply({"params": p}, m)["last_hidden_state"]

    rates = chain_rate(fwd, params, mel, None, batch, n_rep=n_rep)
    # whisper processes fixed 30-s windows; report windows/s
    print(f"whisper-large-v3-enc: {max(rates):.1f} windows/s/chip (B={batch}, 30-s windows)")
    return rates


def bench_text(name, builder_cfg, batch, seq, n_rep=2):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 1000, size=(batch, seq)))
    mask = jnp.ones((batch, seq), jnp.float32)
    model, params = builder_cfg()

    # The chain must CARRY a dependency between iterations: an earlier
    # version accumulated only a scalar, the forward was loop-invariant,
    # and XLA's while-loop LICM evaluated it ONCE — inflating seq/s ~6x
    # (hoisting confirmed on-chip by scripts/exp_text_chain.py; r02's
    # 7172/452 seq/s zoo rows were artifacts of this). ids are integral,
    # so the delta is folded into the float attention mask instead
    # (1.0 + ~1e-12 — numerically invisible, semantically a dependency).
    def fwd(p, i, m):
        return model.apply({"params": p}, i, m)["last_hidden_state"]

    @jax.jit
    def chained(params, ids, mask):
        def body(i, m):
            out = fwd(params, ids, m)
            delta = jnp.sum(out.astype(jnp.float32)) * 1e-12
            return m + delta

        return jax.lax.fori_loop(0, 6, body, mask)

    out = chained(params, ids, mask)
    float(jnp.sum(out))
    rates = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = chained(params, ids, mask)
        float(jnp.sum(out))
        rates.append(batch * 6 / (time.perf_counter() - t0))
    print(f"{name}: {max(rates):.1f} seq/s/chip (B={batch}, {seq}-tok seqs)")
    return rates


def _roberta():
    from interspeech_ser_tpu.models.text import RobertaConfig, RobertaModel

    cfg = RobertaConfig(
        vocab_size=50265, hidden_size=1024, num_layers=24, num_heads=16,
        intermediate_size=4096, max_position_embeddings=514, dtype="bfloat16",
    )
    model = RobertaModel(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, jnp.ones((1, 8), jnp.float32))["params"]
    return model, jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)


def _deberta():
    from interspeech_ser_tpu.models.text import DebertaV2Config, DebertaV2Model

    cfg = DebertaV2Config(
        vocab_size=128100, hidden_size=1536, num_layers=48, num_heads=24,
        intermediate_size=6144, max_position_embeddings=512,
        position_buckets=256, dtype="bfloat16",
    )
    model = DebertaV2Model(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, jnp.ones((1, 8), jnp.float32))["params"]
    return model, jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)


def main():
    from interspeech_ser_tpu.models.speech import (
        hubert_xlarge,
        wav2vec2_xlsr_2b,
        wavlm_large,
    )

    # each arg is "family" or "family:batch" (batch override for sweeps)
    fams = sys.argv[1:] or ["wavlm", "hubert", "w2v2", "whisper", "roberta", "deberta"]
    defaults = {
        "wavlm": 32, "hubert": 16, "w2v2": 16, "whisper": 8,  # w2v2: 68.4 @B16 > 67.0 @B8 (r03 sweep)
        "roberta": 64, "deberta": 32,
    }
    for spec in fams:
        f, _, b = spec.partition(":")
        batch = int(b) if b else defaults[f]
        if f == "wavlm":
            bench_speech("wavlm-large", wavlm_large, batch)
        elif f == "hubert":
            bench_speech("hubert-xlarge", hubert_xlarge, batch)
        elif f == "w2v2":
            bench_speech("w2v2-xls-r-2b", wav2vec2_xlsr_2b, batch)
        elif f == "whisper":
            bench_whisper(batch)
        elif f == "roberta":
            bench_text("roberta-large", _roberta, batch, 80)
        elif f == "deberta":
            bench_text("deberta-v2-xxl", _deberta, batch, 80)


if __name__ == "__main__":
    main()
