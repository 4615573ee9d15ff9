"""Whisper decoder + greedy transcription on TPU.

Capability port of the reference's transcription layer
(reference: test/Whisper transcriptions.ipynb cells 10,15 — batched
``WhisperForConditionalGeneration.generate`` over all wavs →
``whisper_transcript.csv``). The decoder is the standard Whisper
architecture (pre-LN, learned positions, causal self-attention +
cross-attention, tied embedding LM head); generation is greedy
(``generate(do_sample=False)`` equivalence) implemented as a single
``lax.scan`` over a static ``max_len`` with a preallocated KV cache —
one compile, zero host round-trips per token.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention_core import NEG_INF


@dataclasses.dataclass(frozen=True)
class WhisperDecoderConfig:
    vocab_size: int = 51866
    d_model: int = 1280
    decoder_layers: int = 32
    decoder_attention_heads: int = 20
    decoder_ffn_dim: int = 5120
    max_target_positions: int = 448
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @classmethod
    def from_hf(cls, c, dtype="float32"):
        return cls(
            vocab_size=c.vocab_size, d_model=c.d_model,
            decoder_layers=c.decoder_layers,
            decoder_attention_heads=c.decoder_attention_heads,
            decoder_ffn_dim=c.decoder_ffn_dim,
            max_target_positions=c.max_target_positions, dtype=dtype,
        )


class _DecAttention(nn.Module):
    """Cached attention; self (causal, growing cache) or cross (static kv)."""

    config: WhisperDecoderConfig
    k_bias: bool = False

    @nn.compact
    def __call__(self, q_in, k_in, v_in, mask=None):
        cfg = self.config
        D, H = cfg.d_model, cfg.decoder_attention_heads
        hd = D // H
        dt = cfg.compute_dtype
        q = nn.Dense(D, dtype=dt, param_dtype=jnp.float32, name="q_proj")(q_in)
        k = nn.Dense(D, use_bias=False, dtype=dt, param_dtype=jnp.float32, name="k_proj")(k_in)
        v = nn.Dense(D, dtype=dt, param_dtype=jnp.float32, name="v_proj")(v_in)
        B, Tq, _ = q.shape
        Tk = k.shape[1]
        q = q.reshape(B, Tq, H, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
        k = k.reshape(B, Tk, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Tk, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        if mask is not None:
            scores = jnp.where(mask, scores, NEG_INF)
        w = jax.nn.softmax(scores, axis=-1).astype(dt)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32)
        out = out.astype(dt).transpose(0, 2, 1, 3).reshape(B, Tq, D)
        return nn.Dense(D, dtype=dt, param_dtype=jnp.float32, name="out_proj")(out)


class _DecoderLayer(nn.Module):
    config: WhisperDecoderConfig

    @nn.compact
    def __call__(self, x, encoder_out, self_mask, cross_mask):
        cfg = self.config
        dt = cfg.compute_dtype
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name
        )
        h = ln("self_attn_layer_norm")(x).astype(dt)
        x = x + _DecAttention(cfg, name="self_attn")(h, h, h, self_mask)
        h = ln("encoder_attn_layer_norm")(x).astype(dt)
        x = x + _DecAttention(cfg, name="encoder_attn")(h, encoder_out, encoder_out, cross_mask)
        h = ln("final_layer_norm")(x).astype(dt)
        h = nn.Dense(cfg.decoder_ffn_dim, dtype=dt, param_dtype=jnp.float32, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.d_model, dtype=dt, param_dtype=jnp.float32, name="fc2")(h)
        return x + h


class WhisperDecoderModel(nn.Module):
    """Teacher-forced decoder forward: logits over the vocab.

    Greedy generation reuses this with full-sequence inputs inside a scan
    (recompute-over-cache tradeoff: for ≤448 target positions and ≤1500
    encoder frames the full causal forward per step is MXU-cheap and keeps
    one compiled program; a persistent KV cache is a later optimization).
    """

    config: WhisperDecoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # [B, T]
        encoder_out: jnp.ndarray,  # [B, S, D]
        position_offset: int = 0,
        valid_len: Optional[jnp.ndarray] = None,  # [B] causal-visible prefix
    ):
        cfg = self.config
        dt = cfg.compute_dtype
        B, T = input_ids.shape
        embed = self.param(
            "embed_tokens", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.d_model), jnp.float32,
        )
        pos = self.param(
            "embed_positions", nn.initializers.normal(0.02),
            (cfg.max_target_positions, cfg.d_model), jnp.float32,
        )
        embed = jnp.asarray(embed)
        x = (embed[input_ids] + jnp.asarray(pos)[position_offset : position_offset + T]).astype(dt)

        causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
        if valid_len is not None:
            keep = (jnp.arange(T)[None, :] < valid_len[:, None])[:, None, None, :]
            causal = jnp.logical_and(causal, keep)
        for i in range(cfg.decoder_layers):
            x = _DecoderLayer(cfg, name=f"layer{i}")(x, encoder_out, causal, None)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name="layer_norm",
        )(x)
        return x @ embed.T  # tied LM head, f32 logits


from functools import partial


@partial(
    jax.jit,
    static_argnames=("decoder", "prompt_ids", "eot_id", "max_new_tokens", "suppress_ids"),
)
def _greedy_decode_jit(decoder, params, encoder_out, prompt_ids, eot_id,
                       max_new_tokens, suppress_ids):
    B = encoder_out.shape[0]
    P = len(prompt_ids)
    total = P + max_new_tokens
    tokens0 = jnp.full((B, total), eot_id, jnp.int32)
    tokens0 = tokens0.at[:, :P].set(jnp.asarray(prompt_ids, jnp.int32)[None])
    sup = None if suppress_ids is None else jnp.asarray(suppress_ids)

    def step(carry, i):
        tokens, finished = carry
        logits = decoder.apply(
            {"params": params}, tokens, encoder_out, valid_len=jnp.full((B,), i)
        )  # [B, total, V]
        next_logits = jax.lax.dynamic_slice_in_dim(logits, i - 1, 1, axis=1)[:, 0]
        if sup is not None:
            next_logits = next_logits.at[:, sup].set(NEG_INF)
        nxt = jnp.argmax(next_logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, eot_id, nxt)
        col = (jnp.arange(total) == i)[None, :]
        tokens = jnp.where(col, nxt[:, None], tokens)
        finished = jnp.logical_or(finished, nxt == eot_id)
        return (tokens, finished), None

    (tokens, _), _ = jax.lax.scan(
        step, (tokens0, jnp.zeros((B,), bool)), jnp.arange(P, total)
    )
    return tokens


def greedy_decode(
    decoder: WhisperDecoderModel,
    params: Dict,
    encoder_out: jnp.ndarray,  # [B, S, D]
    prompt_ids: np.ndarray,  # [P] forced decoder start (sot sequence)
    eot_id: int,
    max_new_tokens: int = 200,
    suppress_ids: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """Greedy generation (full recompute per token) → token ids [B, P+N].

    Jitted with the prompt/suppress lists static: re-tracing the 32-layer
    unrolled scan body cost ~14 s PER CALL over the tunneled runtime before
    this was cached (one compile per (B, S, P, N) signature).
    """
    return _greedy_decode_jit(
        decoder, params, encoder_out, tuple(int(t) for t in prompt_ids),
        int(eot_id), int(max_new_tokens),
        None if suppress_ids is None else tuple(int(t) for t in suppress_ids),
    )


def _linear(p, x):
    out = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def _ln(p, x, eps):
    m = x.astype(jnp.float32)
    mu = m.mean(-1, keepdims=True)
    var = m.var(-1, keepdims=True)
    return (
        (m - mu) * jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
        + p["bias"].astype(jnp.float32)
    )


@partial(
    jax.jit,
    static_argnames=("decoder", "prompt_ids", "eot_id", "max_new_tokens", "suppress_ids"),
)
def _greedy_decode_cached_jit(decoder, params, encoder_out, prompt_ids, eot_id,
                              max_new_tokens, suppress_ids):
    cfg = decoder.config
    D, H, L = cfg.d_model, cfg.decoder_attention_heads, cfg.decoder_layers
    hd = D // H
    eps = cfg.layer_norm_eps
    dt = cfg.compute_dtype
    B = encoder_out.shape[0]
    P = len(prompt_ids)
    total = P + max_new_tokens
    enc = encoder_out.astype(dt)
    embed = jnp.asarray(params["embed_tokens"])
    pos = jnp.asarray(params["embed_positions"])
    sup = None if suppress_ids is None else jnp.asarray(suppress_ids)

    # pre-cast the layer weights ONCE: a cast inside the scan body would
    # re-stream all ~850M f32 decoder params through the VPU every token
    # (measured 280 ms/step → 9 ms/step on v5e). LayerNorm params are
    # cast back to f32 inside _ln, so bf16 mode keeps f32 norm math.
    def cast(a):
        a = jnp.asarray(a)
        return a.astype(dt) if a.dtype == jnp.float32 else a

    def cast_tree(node):
        out = {}
        for k, v in node.items():
            if "layer_norm" in k:  # norm params stay f32 (f32 norm math)
                out[k] = jax.tree.map(jnp.asarray, v)
            elif isinstance(v, dict):
                out[k] = cast_tree(v)
            else:
                out[k] = cast(v)
        return out

    params = {
        k: (cast_tree(v) if k.startswith("layer") and k != "layer_norm" else v)
        for k, v in params.items()
    }

    # cross-attention K/V: static per utterance — project ONCE
    cross_kv = []
    for i in range(L):
        a = params[f"layer{i}"]["encoder_attn"]
        k = _linear(a["k_proj"], enc).reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
        v = _linear(a["v_proj"], enc).reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
        cross_kv.append((k, v))

    k_cache0 = jnp.zeros((L, B, H, total, hd), dt)
    v_cache0 = jnp.zeros((L, B, H, total, hd), dt)
    pos_ids = jnp.arange(total)

    def token_step(tokens, k_cache, v_cache, idx):
        """One-token forward at position idx; returns logits + new caches."""
        tok = jax.lax.dynamic_slice_in_dim(tokens, idx, 1, axis=1)  # [B,1]
        x = (
            embed[tok[:, 0]][:, None, :]
            + jax.lax.dynamic_slice_in_dim(pos, idx, 1, axis=0)[None]
        ).astype(dt)  # [B, 1, D]
        for i in range(L):
            lp = params[f"layer{i}"]
            h = _ln(lp["self_attn_layer_norm"], x, eps).astype(dt)
            a = lp["self_attn"]
            q = _linear(a["q_proj"], h).reshape(B, H, hd) * (hd ** -0.5)
            k_new = _linear(a["k_proj"], h).reshape(B, H, hd)
            v_new = _linear(a["v_proj"], h).reshape(B, H, hd)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_new[None, :, :, None, :], (i, 0, 0, idx, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_new[None, :, :, None, :], (i, 0, 0, idx, 0)
            )
            scores = jnp.einsum(
                "bhd,bhkd->bhk", q, k_cache[i], preferred_element_type=jnp.float32
            )
            scores = jnp.where(pos_ids[None, None, :] <= idx, scores, NEG_INF)
            w = jax.nn.softmax(scores, axis=-1).astype(dt)
            o = jnp.einsum(
                "bhk,bhkd->bhd", w, v_cache[i], preferred_element_type=jnp.float32
            ).astype(dt)
            x = x + _linear(a["out_proj"], o.reshape(B, 1, D))

            h = _ln(lp["encoder_attn_layer_norm"], x, eps).astype(dt)
            a = lp["encoder_attn"]
            q = _linear(a["q_proj"], h).reshape(B, H, hd) * (hd ** -0.5)
            ck, cv = cross_kv[i]
            scores = jnp.einsum(
                "bhd,bhkd->bhk", q, ck, preferred_element_type=jnp.float32
            )
            w = jax.nn.softmax(scores, axis=-1).astype(dt)
            o = jnp.einsum(
                "bhk,bhkd->bhd", w, cv, preferred_element_type=jnp.float32
            ).astype(dt)
            x = x + _linear(a["out_proj"], o.reshape(B, 1, D))

            h = _ln(lp["final_layer_norm"], x, eps).astype(dt)
            h = jax.nn.gelu(_linear(lp["fc1"], h), approximate=False)
            x = x + _linear(lp["fc2"], h.astype(dt))
        x = _ln(params["layer_norm"], x, eps)
        return x[:, 0] @ embed.T, k_cache, v_cache  # [B, V] f32

    tokens0 = jnp.full((B, total), eot_id, jnp.int32)
    tokens0 = tokens0.at[:, :P].set(jnp.asarray(prompt_ids, jnp.int32)[None])

    def scan_step(carry, i):
        tokens, finished, k_cache, v_cache = carry
        logits, k_cache, v_cache = token_step(tokens, k_cache, v_cache, i - 1)
        # positions < P just fill the cache; from P on we also emit tokens
        emit = i >= P
        if sup is not None:
            logits = logits.at[:, sup].set(NEG_INF)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, eot_id, nxt)
        col = (jnp.arange(total) == i)[None, :]
        tokens = jnp.where(jnp.logical_and(col, emit), nxt[:, None], tokens)
        finished = jnp.logical_or(finished, jnp.logical_and(emit, nxt == eot_id))
        return (tokens, finished, k_cache, v_cache), None

    (tokens, _, _, _), _ = jax.lax.scan(
        scan_step,
        (tokens0, jnp.zeros((B,), bool), k_cache0, v_cache0),
        jnp.arange(1, total),
    )
    return tokens


def greedy_decode_cached(
    decoder: WhisperDecoderModel,
    params: Dict,
    encoder_out: jnp.ndarray,  # [B, S, D]
    prompt_ids: np.ndarray,  # [P] forced decoder start (sot sequence)
    eot_id: int,
    max_new_tokens: int = 200,
    suppress_ids: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """KV-cached greedy generation — identical tokens to ``greedy_decode``.

    The recompute path re-runs the full causal forward (O(T²) per sequence,
    plus 2·L cross-attention K/V projections over the S=1500 encoder frames
    EVERY step). Here the cross K/V are projected once, self-attention K/V
    accumulate in preallocated [B, H, total, hd] caches, the layer weights
    are pre-cast to the compute dtype outside the scan, and each step is a
    single-token forward. Jitted with static prompt/suppress (one compile
    per signature; re-tracing alone cost ~14 s/call over the tunnel).
    Measured speedup at Whisper-large transcription shapes: see STATUS.
    """
    return _greedy_decode_cached_jit(
        decoder, params, encoder_out, tuple(int(t) for t in prompt_ids),
        int(eot_id), int(max_new_tokens),
        None if suppress_ids is None else tuple(int(t) for t in suppress_ids),
    )


def whisper_decoder_hf_to_flax(sd: Dict[str, np.ndarray], config) -> Dict:
    """HF WhisperDecoder state dict → WhisperDecoderModel params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    for prefix in ("model.decoder.", "decoder."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            break
    p: Dict = {
        "embed_tokens": sd["embed_tokens.weight"],
        "embed_positions": sd["embed_positions.weight"],
        "layer_norm": {"scale": sd["layer_norm.weight"], "bias": sd["layer_norm.bias"]},
    }
    for i in range(config.decoder_layers):
        base = f"layers.{i}"
        layer: Dict = {}
        for attn in ("self_attn", "encoder_attn"):
            a: Dict = {}
            for proj in ("q_proj", "v_proj", "out_proj"):
                a[proj] = {
                    "kernel": sd[f"{base}.{attn}.{proj}.weight"].T,
                    "bias": sd[f"{base}.{attn}.{proj}.bias"],
                }
            a["k_proj"] = {"kernel": sd[f"{base}.{attn}.k_proj.weight"].T}
            layer[attn] = a
            layer[f"{attn}_layer_norm"] = {
                "scale": sd[f"{base}.{attn}_layer_norm.weight"],
                "bias": sd[f"{base}.{attn}_layer_norm.bias"],
            }
        layer["final_layer_norm"] = {
            "scale": sd[f"{base}.final_layer_norm.weight"],
            "bias": sd[f"{base}.final_layer_norm.bias"],
        }
        layer["fc1"] = {"kernel": sd[f"{base}.fc1.weight"].T, "bias": sd[f"{base}.fc1.bias"]}
        layer["fc2"] = {"kernel": sd[f"{base}.fc2.weight"].T, "bias": sd[f"{base}.fc2.bias"]}
        p[f"layer{i}"] = layer
    return p
