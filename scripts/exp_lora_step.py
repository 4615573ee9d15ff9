#!/usr/bin/env python
"""A/B the differentiable one-shot attention pair on the REAL whisper
LoRA fine-tune step (v5e), merge cost included, with a batch sweep.

Why this exists: scripts/exp_attn_bwd.py measured the pair on a bare
encoder fine-tune loss (all-params grad). The production whisper path
(`train/lora_engine.LoRAFTEngine`) differs in two ways that could eat
the 1.279x win:
  - the forward pays ``merge_lora`` (W + (α/r)·A@B over 32×2 q/v
    kernels — ~420 MB of f32 weight writes per step at whisper-large
    size) inside the jit;
  - grads flow only into the LoRA factors + head (base is
    stop_gradient'd), which changes the backward's dk/dv consumers.

This script rebuilds the engine's exact step (merge + on-device log-mel
+ mean-pool head + weighted CE) at whisper-large-v3 card size with
random weights and times XLA autodiff vs SER_TPU_ATTN_IMPL=
oneshot2_train at B ∈ {2, 4, 8}. Same parity guard + chained-dispatch
timing as exp_attn_bwd (the tunnel defeats per-call timing).

Run: python scripts/exp_lora_step.py [batch ...]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from exp_attn_bwd import run_case  # noqa: E402 (script-local import)


def lora_case(batch: int):
    from interspeech_ser_tpu.models import lora as lora_lib
    from interspeech_ser_tpu.models.whisper import (
        WhisperEncoderConfig,
        WhisperEncoderModel,
        whisper_large_v3,
    )
    from interspeech_ser_tpu.ops.mel import whisper_log_mel
    from interspeech_ser_tpu.train import losses
    from interspeech_ser_tpu.train.lora_engine import MeanPoolClassifier

    dt = os.environ.get("EXP_DTYPE", "bfloat16")
    if os.environ.get("EXP_SMALL") == "1":  # CPU smoke of the harness
        cfg = WhisperEncoderConfig(
            num_mel_bins=16, d_model=32, encoder_layers=2,
            encoder_attention_heads=4, encoder_ffn_dim=64,
            max_source_positions=60, dtype=dt,
        )
        n_samples = 60 * 2 * 160  # mel frames = samples/160; enc T = frames/2
    else:
        cfg = whisper_large_v3(dtype=dt)
        n_samples = 480000  # 30 s
    model = WhisperEncoderModel(cfg)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(batch, n_samples)).astype(np.float32) * 0.1)
    mask = jnp.ones((batch, n_samples), jnp.float32)
    y = jnp.asarray(rng.integers(0, 8, size=(batch,)), jnp.int32)
    smask = jnp.ones((batch,), jnp.float32)

    mel0 = whisper_log_mel(wav[:1], cfg.num_mel_bins)
    # host-side init (eval_shape + numpy): model.init at whisper-large
    # size compiles a full init program — minutes over the remote tunnel
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), mel0))["params"]
    base = jax.tree.map(
        lambda s: jnp.asarray(rng.normal(size=s.shape).astype(np.float32) * 0.02),
        shapes,
    )
    lora = lora_lib.init_lora(
        jax.random.PRNGKey(1), base, lora_lib.match_attention_qv, rank=8
    )
    # B starts at zero → merged == base; nudge it so the kernel path sees
    # non-degenerate factors in the backward
    lora = jax.tree.map(lambda a: a + 0.01, lora)
    head = MeanPoolClassifier(cfg.d_model, 8)
    head_params = head.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 4, cfg.d_model))
    )["params"]
    base = jax.device_put(base)  # pass as an ARG: a closure would embed
    # 2.5 GB of weights as lowered constants (fatal over the tunnel)

    def loss_fn(trainable, base, wav, mask, y, smask):
        merged = lora_lib.merge_lora(
            lora_lib.freeze_base(base), trainable["lora"], 16.0, 8
        )
        mel = whisper_log_mel(wav, cfg.num_mel_bins)
        out = model.apply({"params": merged}, mel)
        h = out["last_hidden_state"]
        T = h.shape[1]
        n_samp = jnp.sum(mask, axis=1)
        fmask = (jnp.arange(T)[None, :] * 320 < n_samp[:, None]).astype(jnp.float32)
        logits = head.apply({"params": trainable["head"]}, h, fmask)
        return losses.weighted_cross_entropy(logits, y, None, smask)

    trainable = {"lora": lora, "head": head_params}
    run_case(
        f"whisper-lora(B{batch},30s,{dt})", loss_fn, trainable, base, wav, mask, y, smask
    )


if __name__ == "__main__":
    batches = [int(a) for a in sys.argv[1:]] or [2, 4, 8]
    for b in batches:
        lora_case(b)
