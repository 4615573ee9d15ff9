"""Text encoders on TPU: RoBERTa-large and DeBERTa-v2-xxlarge.

The reference extracts per-utterance transcript embeddings with
RoBERTa-large (reference: preprocessing/preprocess_roberta.py:45-76,
tokenizer padding='max_length' 80) and DeBERTa-v2-xxlarge
(preprocess_deroberta.py:47-78). Both models here return all hidden states
(HF indexing) for the layer-select / mean-last-4 options.

RoBERTa = BERT post-LN stack with padding-offset position ids
(position = cumsum(mask)·mask + pad_idx). DeBERTa-v2 adds disentangled
attention (content↔position c2p/p2c terms over log-bucketed relative
positions, shared-key projections), an embedding-width projection, a
post-layer-0 conv branch, and rel-embedding LayerNorm — the hard text
variant called out in SURVEY.md §7.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention_core import dot_product_attention

NEG_INF = jnp.finfo(jnp.float32).min


# ---------------------------------------------------------------------------
# RoBERTa
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @classmethod
    def from_hf(cls, c, dtype="float32"):
        return cls(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            num_layers=c.num_hidden_layers, num_heads=c.num_attention_heads,
            intermediate_size=c.intermediate_size,
            max_position_embeddings=c.max_position_embeddings,
            type_vocab_size=c.type_vocab_size, pad_token_id=c.pad_token_id,
            layer_norm_eps=c.layer_norm_eps, dtype=dtype,
        )


def roberta_large(dtype="float32") -> RobertaConfig:
    return RobertaConfig(dtype=dtype)


class _BertSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, key_mask):
        D, H = self.hidden_size, self.num_heads
        hd = D // H
        B, T, _ = x.shape
        q = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32, name="query")(x)
        k = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32, name="key")(x)
        v = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32, name="value")(x)
        q = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        out = dot_product_attention(q, k, v, key_mask=key_mask)
        return out.transpose(0, 2, 1, 3).reshape(B, T, D)


class _BertLayer(nn.Module):
    config: RobertaConfig

    @nn.compact
    def __call__(self, x, key_mask):
        cfg = self.config
        dt = cfg.compute_dtype
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name
        )
        h = _BertSelfAttention(cfg.hidden_size, cfg.num_heads, dt, name="self")(x, key_mask)
        h = nn.Dense(cfg.hidden_size, dtype=dt, param_dtype=jnp.float32, name="attn_output")(h)
        x = ln("attn_layer_norm")(x + h).astype(dt)
        h = nn.Dense(
            cfg.intermediate_size, dtype=dt, param_dtype=jnp.float32, name="intermediate"
        )(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=dt, param_dtype=jnp.float32, name="output")(h)
        return ln("output_layer_norm")(x + h).astype(dt)


class RobertaModel(nn.Module):
    """input_ids [B, T] + attention_mask → hidden states (post-LN BERT)."""

    config: RobertaConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None):
        cfg = self.config
        dt = cfg.compute_dtype
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)

        word_emb = self.param(
            "word_embeddings", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size), jnp.float32,
        )
        pos_emb = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32,
        )
        type_emb = self.param(
            "token_type_embeddings", nn.initializers.normal(0.02),
            (cfg.type_vocab_size, cfg.hidden_size), jnp.float32,
        )
        # RoBERTa's padding-offset position ids (HF create_position_ids_…)
        mask_i = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        position_ids = jnp.cumsum(mask_i, axis=1) * mask_i + cfg.pad_token_id

        h = (jnp.asarray(word_emb)[input_ids] + jnp.asarray(pos_emb)[position_ids]
             + jnp.asarray(type_emb)[jnp.zeros_like(input_ids)])
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name="emb_layer_norm",
        )(h).astype(dt)

        hidden_states: List[jnp.ndarray] = [h]
        for i in range(cfg.num_layers):
            h = _BertLayer(cfg, name=f"layer{i}")(h, attention_mask)
            hidden_states.append(h)
        return {"last_hidden_state": h, "hidden_states": hidden_states}


# ---------------------------------------------------------------------------
# DeBERTa-v2
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DebertaV2Config:
    vocab_size: int = 128100
    hidden_size: int = 1536
    num_layers: int = 48
    num_heads: int = 24
    intermediate_size: int = 6144
    max_position_embeddings: int = 512
    position_buckets: int = 256
    max_relative_positions: int = -1
    pad_token_id: int = 0
    type_vocab_size: int = 0
    position_biased_input: bool = False
    conv_kernel_size: int = 3
    conv_act: str = "gelu"
    layer_norm_eps: float = 1e-7
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def att_span(self) -> int:
        if self.position_buckets > 0:
            return self.position_buckets
        mrp = self.max_relative_positions
        return mrp if mrp > 0 else self.max_position_embeddings

    @classmethod
    def from_hf(cls, c, dtype="float32"):
        # this port implements the deberta-v2-xxlarge card's attention
        # variant only; configs outside it would silently compute different
        # math (caught by the full-size audit), so refuse them loudly
        if not getattr(c, "share_att_key", False):
            raise NotImplementedError(
                "DebertaV2 port requires share_att_key=True (the v2/v3 "
                "card setting); separate pos_{key,query}_proj not implemented"
            )
        if getattr(c, "position_biased_input", True):
            raise NotImplementedError(
                "DebertaV2 port requires position_biased_input=False "
                "(the v2/v3 card setting)"
            )
        return cls(
            vocab_size=c.vocab_size, hidden_size=c.hidden_size,
            num_layers=c.num_hidden_layers, num_heads=c.num_attention_heads,
            intermediate_size=c.intermediate_size,
            max_position_embeddings=c.max_position_embeddings,
            position_buckets=getattr(c, "position_buckets", -1),
            max_relative_positions=getattr(c, "max_relative_positions", -1),
            pad_token_id=getattr(c, "pad_token_id", 0),
            type_vocab_size=c.type_vocab_size,
            position_biased_input=getattr(c, "position_biased_input", True),
            conv_kernel_size=getattr(c, "conv_kernel_size", 0),
            conv_act=getattr(c, "conv_act", "tanh"),
            layer_norm_eps=c.layer_norm_eps, dtype=dtype,
        )


def deberta_v2_xxlarge(dtype="float32") -> DebertaV2Config:
    return DebertaV2Config(dtype=dtype)


def _log_bucket_1d(rel: np.ndarray, bucket_size: int, max_position: int) -> np.ndarray:
    """HF make_log_bucket_position on an arbitrary relative-offset array."""
    if bucket_size <= 0 or max_position <= 0:
        return rel.astype(np.int64)
    sign = np.sign(rel)
    mid = bucket_size // 2
    abs_pos = np.where((rel < mid) & (rel > -mid), mid - 1, np.abs(rel))
    log_pos = (
        np.ceil(np.log(abs_pos / mid) / np.log((max_position - 1) / mid) * (mid - 1)) + mid
    )
    return np.where(abs_pos <= mid, rel, (log_pos * sign)).astype(np.int64)


def _log_bucket_positions(t: int, bucket_size: int, max_position: int) -> np.ndarray:
    """DeBERTa log-bucketed relative positions [t, t] (HF
    make_log_bucket_position semantics, numpy at trace time)."""
    rel = np.arange(t)[:, None] - np.arange(t)[None, :]
    return _log_bucket_1d(rel, bucket_size, max_position)


def _gather_last_static(x: jnp.ndarray, idx: np.ndarray, max_onehot_elems: int = 16_000_000):
    """y[..., q, k] = x[..., q, idx[q, k]] for a STATIC index matrix.

    ``jnp.take_along_axis`` lowers to a lane-dimension gather, which the
    TPU executes element-at-a-time — measured ~6 ms/layer on the
    disentangled-attention c2p/p2c selects at B=32, T=80 (48 layers of it
    made DeBERTa-v2-xxl ~20 TF/s; scripts/exp_text_chain.py). Because the
    bucket matrix is known at trace time, the same select is a one-hot
    matmul that rides the MXU: slice x to the used index window, build a
    {0,1} constant [Q, W, K], contract over W. Each output row is
    1.0·x[...] + zeros — exact, no rounding beyond the dot's f32 accumulate.

    Falls back to take_along_axis when the one-hot constant would be
    unreasonably large (long-T log-bucket regime; extraction runs T=80).
    """
    q_n, k_n = idx.shape
    lo, hi = int(idx.min()), int(idx.max()) + 1
    if q_n * (hi - lo) * k_n > max_onehot_elems:
        return jnp.take_along_axis(x, jnp.asarray(idx)[None, None], axis=-1)
    onehot = np.zeros((q_n, hi - lo, k_n), np.float32)
    qq, kk = np.meshgrid(np.arange(q_n), np.arange(k_n), indexing="ij")
    onehot[qq, idx - lo, kk] = 1.0
    return jnp.einsum(
        "...qs,qsk->...qk", x[..., lo:hi], jnp.asarray(onehot),
        preferred_element_type=jnp.float32,
    )


def _toeplitz_rel_select(x: jnp.ndarray, idx_1d: np.ndarray, t: int) -> jnp.ndarray:
    """y[..., q, k] = x[..., q, idx_1d[(q - k) + (t-1)]] — the DeBERTa
    c2p/p2c select exploiting that the bucket index depends ONLY on the
    relative offset q−k (Toeplitz structure).

    Instead of a q-batched one-hot select (80 small GEMMs with layout
    transposes around them — the r04 DeBERTa anatomy put the branch at
    ~46 TF/s vs the GEMM core's 115), this factors into:
      1. ONE unbatched one-hot matmul over relative offsets:
         xr[..., q, r] = x[..., q, idx_1d[r]]  via a static {0,1}
         [W, 2t-1] matrix — m = B·H·t rows, a proper MXU shape;
      2. a pad/flatten/reshape skew (the Music-Transformer relative-
         attention trick) realizing y[q, k] = xr[q, q−k+t−1] in pure
         layout ops, no gather.
    Exact: every output is 1.0·x[...] selected by the one-hot.

    ``x`` is the bucket-windowed tensor [..., t, W]; ``idx_1d[r]`` maps
    relative offset r−(t−1) to its window bucket, r ∈ [0, 2t−2].
    """
    L = 2 * t - 1
    W = x.shape[-1]
    sel = np.zeros((W, L), np.float32)
    sel[idx_1d, np.arange(L)] = 1.0
    xr = jnp.einsum(
        "...qs,sr->...qr", x, jnp.asarray(sel), preferred_element_type=jnp.float32
    )  # [..., t, L]
    lead = xr.shape[:-2]
    flat = xr.reshape(*lead, t * L)
    flat = jnp.pad(flat, [(0, 0)] * len(lead) + [(0, t)])
    z = flat.reshape(*lead, t, L + 1)[..., :t]  # z[q, j] = xr[q, q + j]
    return z[..., ::-1]  # y[q, k] = z[q, t-1-k] = xr[q, q - k + t - 1]


class _DisentangledSelfAttention(nn.Module):
    config: DebertaV2Config

    @nn.compact
    def __call__(self, x, pair_mask, rel_embeddings):
        """x [B,T,D]; pair_mask [B,T,T] bool; rel_embeddings [2*span, D]."""
        cfg = self.config
        D, H = cfg.hidden_size, cfg.num_heads
        hd = D // H
        dt = cfg.compute_dtype
        B, T, _ = x.shape

        q_proj = nn.Dense(D, dtype=dt, param_dtype=jnp.float32, name="query_proj")
        k_proj = nn.Dense(D, dtype=dt, param_dtype=jnp.float32, name="key_proj")
        v_proj = nn.Dense(D, dtype=dt, param_dtype=jnp.float32, name="value_proj")

        def heads(y, t):
            return y.reshape(B, t, H, hd).transpose(0, 2, 1, 3)

        q = heads(q_proj(x), T)
        k = heads(k_proj(x), T)
        v = heads(v_proj(x), T)

        scale_factor = 3  # content + c2p + p2c
        scale = float(np.sqrt(hd * scale_factor))
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k / scale, preferred_element_type=jnp.float32
        )

        span = cfg.att_span
        mrp = cfg.max_relative_positions
        if mrp < 1:
            mrp = cfg.max_position_embeddings
        rel_pos = _log_bucket_positions(T, cfg.position_buckets, mrp)  # [T, T]

        # shared-key projections of the relative embeddings (xxlarge uses
        # share_att_key=True)
        rel = rel_embeddings[: span * 2].astype(dt)  # [2S, D]
        pos_k = k_proj(rel).reshape(2 * span, H, hd).transpose(1, 0, 2)  # [H,2S,hd]
        pos_q = q_proj(rel).reshape(2 * span, H, hd).transpose(1, 0, 2)

        # c2p: score[q, k] += q_vec · pos_key[bucket(q-k)+S] / scale
        # The einsums are WINDOWED to the bucket range the select actually
        # uses (static at trace time): at T=80 only ~159 of the 2S=512
        # buckets are reachable, and the un-windowed [B,H,T,2S] f32
        # intermediates cost 3.2x the FLOPs and ~250 MB/layer of HBM
        # traffic for values the select immediately drops (r04 anatomy:
        # the branch ran at ~46 TF/s vs the GEMM core's 115 —
        # scripts/exp_deberta_anatomy.py). A Toeplitz reformulation of
        # the select (one unbatched one-hot matmul over relative offsets
        # + a pad/reshape skew, _toeplitz_rel_select) measured 243.9 vs
        # 395.4 seq/s on v5e — the skew's lane-dim reshapes force full
        # relayouts on the (8,128)-tiled layout, a TPU anti-pattern —
        # so the q-batched windowed one-hot select stays the default
        # (SER_TPU_DEBERTA_TOEPLITZ=1 re-enables the experiment).
        use_toeplitz = (
            os.environ.get("SER_TPU_DEBERTA_TOEPLITZ") == "1" and T <= 256
        )
        rel_1d = np.arange(-(T - 1), T)  # offset r - (T-1)
        b1d = _log_bucket_1d(rel_1d, cfg.position_buckets, mrp)

        c2p_1d = np.clip(b1d + span, 0, 2 * span - 1)  # [2T-1]
        lo_c, hi_c = int(c2p_1d.min()), int(c2p_1d.max()) + 1
        c2p = jnp.einsum(
            "bhqd,hsd->bhqs", q, pos_k[:, lo_c:hi_c],
            preferred_element_type=jnp.float32,
        )
        if use_toeplitz:
            c2p_g = _toeplitz_rel_select(c2p, c2p_1d - lo_c, T)
        else:
            c2p_idx = np.clip(rel_pos + span, 0, 2 * span - 1)  # [T, T]
            c2p_g = _gather_last_static(c2p, c2p_idx - lo_c)
        scores = scores + c2p_g / scale

        # p2c: score[q, k] += k_vec · pos_query[S - bucket(k-q)]ᵀ / scale
        p2c_1d = np.clip(-b1d + span, 0, 2 * span - 1)  # [2T-1]
        lo_p, hi_p = int(p2c_1d.min()), int(p2c_1d.max()) + 1
        p2c = jnp.einsum(
            "bhkd,hsd->bhks", k, pos_q[:, lo_p:hi_p],
            preferred_element_type=jnp.float32,
        )
        if use_toeplitz:
            p2c_g = _toeplitz_rel_select(p2c, p2c_1d - lo_p, T)
        else:
            p2c_idx = np.clip(-rel_pos + span, 0, 2 * span - 1)
            p2c_g = _gather_last_static(p2c, p2c_idx - lo_p)
        scores = scores + jnp.swapaxes(p2c_g, -1, -2) / scale

        scores = jnp.where(pair_mask[:, None], scores, NEG_INF)
        weights = jax.nn.softmax(scores, axis=-1).astype(dt)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32
        ).astype(dt)
        return out.transpose(0, 2, 1, 3).reshape(B, T, D)


class _DebertaLayer(nn.Module):
    config: DebertaV2Config

    @nn.compact
    def __call__(self, x, pair_mask, rel_embeddings):
        cfg = self.config
        dt = cfg.compute_dtype
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name
        )
        h = _DisentangledSelfAttention(cfg, name="self")(x, pair_mask, rel_embeddings)
        h = nn.Dense(cfg.hidden_size, dtype=dt, param_dtype=jnp.float32, name="attn_output")(h)
        x = ln("attn_layer_norm")(x + h).astype(dt)
        h = nn.Dense(
            cfg.intermediate_size, dtype=dt, param_dtype=jnp.float32, name="intermediate"
        )(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=dt, param_dtype=jnp.float32, name="output")(h)
        return ln("output_layer_norm")(x + h).astype(dt)


class DebertaV2Model(nn.Module):
    """input_ids [B, T] + attention_mask → hidden states."""

    config: DebertaV2Config

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None):
        cfg = self.config
        dt = cfg.compute_dtype
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        mask_f = attention_mask.astype(jnp.float32)

        word_emb = self.param(
            "word_embeddings", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size), jnp.float32,
        )
        h = jnp.asarray(word_emb)[input_ids]
        if cfg.position_biased_input:
            pos_emb = self.param(
                "position_embeddings", nn.initializers.normal(0.02),
                (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32,
            )
            h = h + jnp.asarray(pos_emb)[jnp.arange(input_ids.shape[1])][None]
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name="emb_layer_norm",
        )(h)
        h = (h * mask_f[:, :, None]).astype(dt)

        pair_mask = (mask_f[:, :, None] * mask_f[:, None, :]).astype(bool)  # [B,T,T]

        span = cfg.att_span
        rel_embeddings = self.param(
            "rel_embeddings", nn.initializers.normal(0.02),
            (2 * span, cfg.hidden_size), jnp.float32,
        )
        rel_ln = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name="rel_emb_layer_norm",
        )(rel_embeddings)

        hidden_states: List[jnp.ndarray] = [h]
        embeddings_out = h
        for i in range(cfg.num_layers):
            h = _DebertaLayer(cfg, name=f"layer{i}")(h, pair_mask, rel_ln)
            if i == 0 and cfg.conv_kernel_size > 0:
                # conv branch over the *embedding* output, residual into
                # layer-0 output (HF DebertaV2Encoder.forward)
                c = nn.Conv(
                    cfg.hidden_size, (cfg.conv_kernel_size,),
                    padding=[((cfg.conv_kernel_size - 1) // 2,) * 2],
                    dtype=dt, param_dtype=jnp.float32, name="conv",
                )(embeddings_out)
                c = c * mask_f[:, :, None].astype(dt)
                c = nn.gelu(c, approximate=False) if cfg.conv_act == "gelu" else jnp.tanh(c)
                h = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                    param_dtype=jnp.float32, name="conv_layer_norm",
                )(h + c).astype(dt)
                h = h * mask_f[:, :, None].astype(dt)
            hidden_states.append(h)
        return {"last_hidden_state": h, "hidden_states": hidden_states}
