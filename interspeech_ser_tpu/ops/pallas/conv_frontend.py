"""Fused conv-frontend prefix kernel (layer-norm models).

Reference semantics: the 7-layer strided conv feature extractor of
WavLM / wav2vec2-XLS-R / HuBERT (HF ``Wav2Vec2FeatureEncoder``; see
``models/speech.ConvFeatureExtractor``) — conv → LayerNorm(channels) →
GELU per layer, hop 320.

WHY A KERNEL HERE: per-block profiling localized the WavLM frontend drag
to the layer-0 block (b276f44, scripts/exp_frontend_prefix.py): conv0's
output is [B, ~32k, 512] — ~1 GB/pass at B=32 — and XLA materializes it
between conv0 and conv1 (plus epilogue passes), while the convolution
itself is nearly free (3.3 GF). Because the 'layer' norm mode is purely
per-frame (LayerNorm over channels — no cross-time statistics, unlike
the 'group' mode of base models), an arbitrary PREFIX of the frontend
fuses into one pass: each output tile is recomputed straight from the
waveform (VMEM-resident, 640 KB/row), so the giant intermediate
activations never touch HBM at all. HBM traffic for the fused prefix
collapses to: read wav once + write the (much smaller) prefix output.

Grid (B, time-tiles); per tile the kernel walks the fused layers:
patch-matmul (taps gathered by static reshapes; conv0's phase trick
mirrors models/speech.PatchMatmulConv) → +bias → LayerNorm in f32
(fast-variance, matching flax) → GELU in compute dtype. Layers past
``n_fused`` run through the existing XLA path unchanged.

Single-device only (a Pallas custom call does not auto-partition under
GSPMD) and inference-only by call-site policy (no custom_vjp — the
fine-tune paths keep XLA). 'group'-norm models (base) are not supported:
their GroupNorm needs whole-sequence statistics.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 64 * 2 ** 20


def _layer_norm_f32(x, scale, bias, eps):
    """flax LayerNorm semantics (fast variance: E[x²]−E[x]², f32)."""
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(m)
    y = (xf - m) * jax.lax.rsqrt(jnp.maximum(v, 0.0) + eps)
    return y * scale + bias


def _kernel(
    wav_ref,  # [1, R, s0] f32 — whole waveform row pre-gridded to conv0's
    #         stride (XLA-side reshape): row r = samples [r*s0, (r+1)*s0).
    #         Mosaic rejects the in-kernel (1, N) → (N/s, s) shape cast
    #         (lane dim s0=5 is not a supported relayout), so the grid is
    #         built outside and the kernel only row-slices it.
    *refs,  # per fused layer: w, [b,] ln_scale, ln_bias; then out_ref
    layer_spec,  # tuple of (k, s, C, has_bias) per fused layer
    tile_n,  # tuple: conv-output frames computed per layer for one tile
    tile_c,  # tuple: per-layer tile start coefficient (start = c * i)
    dt_name: str,
    approx_gelu: bool,
    eps: float,
):
    out_ref = refs[-1]
    refs = refs[:-1]
    dt = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
    i = pl.program_id(1)

    ri = 0
    x = None
    for li, (k, s, C, has_bias) in enumerate(layer_spec):
        w = refs[ri][...]  # [k*C_in, C]
        ri += 1
        b = None
        if has_bias:
            b = refs[ri][...].astype(jnp.float32)  # [1, C]
            ri += 1
        ln_s = refs[ri][...].astype(jnp.float32)  # [1, C]
        ln_b = refs[ri + 1][...].astype(jnp.float32)  # [1, C]
        ri += 2

        n_out = tile_n[li]
        # Each conv is a SUM OF PER-TAP MATMULS rather than one patch
        # matmul: Mosaic rejects lane-concats of sublane-shifted slices
        # ("offset mismatch on non-concat dimension"), so patches are
        # never materialized — every tap goes straight to the MXU and
        # the f32 accumulator carries the sum. Identical math.
        y = None
        if li == 0:
            # conv0 on raw samples (C_in == 1): k % s == 0, so tap group
            # j covers sample columns [j*s, (j+1)*s) of grid rows
            # [j, j+n_out) — w rows are ordered by tap index.
            for j in range(k // s):
                g = wav_ref[0, pl.ds(tile_c[0] * i + j, n_out), :]  # [n_out, s]
                w_j = w[j * s : (j + 1) * s, :]  # [s, C]
                c = jax.lax.dot_general(
                    g.astype(dt), w_j.astype(dt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                y = c if y is None else y + c
        else:
            # x: [tile_n[li-1], C_in] in dt. Phase-split by ONE reshape
            # (rows r ≡ p mod s land in lane block p), then tap t is a
            # plain sublane slice of phase t % s.
            C_in = layer_spec[li - 1][2]
            half = n_out + (k + s - 1) // s
            pad = s * half - x.shape[0]
            if pad > 0:
                x = jnp.concatenate([x, jnp.zeros((pad, C_in), x.dtype)], axis=0)
            xr = x[: s * half].reshape(half, s * C_in) if s > 1 else x
            for t in range(k):
                p, r = t % s, t // s
                tap = xr[r : r + n_out, p * C_in : (p + 1) * C_in]
                w_t = w[t * C_in : (t + 1) * C_in, :]  # [C_in, C]
                c = jax.lax.dot_general(
                    tap.astype(dt), w_t.astype(dt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                y = c if y is None else y + c
        if b is not None:
            y = y + b
        y = _layer_norm_f32(y, ln_s, ln_b, eps)
        x = jax.nn.gelu(y.astype(dt), approximate=approx_gelu)

    out_ref[0] = x.astype(out_ref.dtype)


def fused_conv_frontend(
    wav: jnp.ndarray,  # [B, L] (any float dtype; cast f32)
    layer_params: Sequence[dict],  # [{kernel, bias?, ln_scale, ln_bias}, ...]
    kernels: Sequence[int],
    strides: Sequence[int],
    dt: jnp.dtype,
    approx_gelu: bool,
    eps: float = 1e-5,
    block_f: int = 1024,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:  # [B, T_out, C] in dt — output of fused layer n-1 (post GELU)
    """Run the first ``len(layer_params)`` frontend layers in one pass.

    ``layer_params[i]['kernel']`` is the flax conv kernel ([k, C_in, C]);
    biases/LN params as in ``ConvFeatureExtractor`` ('layer' norm mode).
    """
    n_fused = len(layer_params)
    assert 1 <= n_fused <= len(kernels)
    B, L = wav.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # per-layer output channel counts + valid lengths
    spec = []
    t = L
    t_valid = []
    for i in range(n_fused):
        k, s = kernels[i], strides[i]
        C = layer_params[i]["kernel"].shape[-1]
        spec.append((k, s, C, "bias" in layer_params[i]))
        t = (t - k) // s + 1
        t_valid.append(t)
    assert kernels[0] % strides[0] == 0, "conv0 phase trick needs k % s == 0"
    C_out = spec[-1][2]
    T_out = t_valid[-1]

    # tile geometry: F output frames per grid step; walk ranges downward
    F = min(block_f, ((T_out + 7) // 8) * 8)
    n_tiles = -(-T_out // F)
    tile_n = [0] * n_fused
    tile_c = [0] * n_fused
    tile_n[n_fused - 1] = F
    tile_c[n_fused - 1] = F
    for li in range(n_fused - 1, 0, -1):
        k, s, _, _ = spec[li]
        tile_n[li - 1] = s * (tile_n[li] - 1) + k
        tile_c[li - 1] = s * tile_c[li]

    # waveform padding: last tile's conv0 phase grid must be in-bounds;
    # row count padded to a sublane multiple (8) for the VMEM block
    k0, s0 = spec[0][0], spec[0][1]
    n_ph = k0 // s0
    n_rows_total = tile_c[0] * (n_tiles - 1) + tile_n[0] + n_ph - 1
    n_rows_total = ((n_rows_total + 7) // 8) * 8
    need_L = n_rows_total * s0
    wavp = wav.astype(jnp.float32)
    if need_L > L:
        wavp = jnp.pad(wavp, ((0, 0), (0, need_L - L)))
    elif need_L < L:
        wavp = wavp[:, :need_L]
    # pre-grid to conv0's stride (see _kernel docstring)
    wav_grid = wavp.reshape(B, n_rows_total, s0)

    inputs = [wav_grid]
    in_specs = [
        pl.BlockSpec((1, n_rows_total, s0), lambda b, i: (b, 0, 0)),
    ]

    def _full(arr2d):
        a = jnp.asarray(arr2d)
        inputs.append(a)
        in_specs.append(pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim))

    for li, p in enumerate(layer_params):
        k, s, C, has_bias = spec[li]
        kern = jnp.asarray(p["kernel"], jnp.float32)  # [k, C_in, C]
        _full(kern.reshape(k * kern.shape[1], C))
        if has_bias:
            _full(jnp.asarray(p["bias"], jnp.float32)[None, :])
        _full(jnp.asarray(p["ln_scale"], jnp.float32)[None, :])
        _full(jnp.asarray(p["ln_bias"], jnp.float32)[None, :])

    kernel = functools.partial(
        _kernel,
        layer_spec=tuple(spec),
        tile_n=tuple(tile_n),
        tile_c=tuple(tile_c),
        dt_name="bfloat16" if dt == jnp.bfloat16 else "float32",
        approx_gelu=approx_gelu,
        eps=eps,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, F, C_out), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * F, C_out), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*inputs)
    return out[:, :T_out]
