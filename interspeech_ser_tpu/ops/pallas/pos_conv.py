"""Pallas kernel for the grouped positional conv embedding.

WavLM/w2v2/HuBERT's positional embedding is a grouped Conv1d (k=128,
groups=16, 64 ch/group, SAME padding + drop-last) over [B, T, 1024]
(reference: HF WavLMPositionalConvEmbedding; repo model:
models/speech.py PositionalConvEmbedding). XLA's grouped conv runs at
~28 TF/s on v5e (4.8 ms of a 64 ms WavLM-large forward at B=16) because
the 64-wide groups defeat its tiling.

This kernel grids over (batch, group): each invocation keeps one group's
padded time slab [T_pad + K, 64] and its kernel [K, 64, 64] in VMEM and
accumulates the conv as a tap loop of [T_out, 64] @ [64, 64] MXU
matmuls. Output layout [B, T_out, G, 64] (caller reshapes to [B, T_out,
D] — identical element order). f32 accumulation; bias + gelu stay
outside (XLA fuses them into the following add).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, k_ref, o_ref, *, taps: int, t_out: int, pack: int):
    # x_ref: [1, 1, T_slab, 64*pack] (``pack`` consecutive taps stacked on
    # the channel axis); k_ref: [1, taps//pack, 64*pack, 64].
    # Static (unrolled) tap windows: Mosaic cannot lower dynamic-offset
    # windowed loads on the sublane axis, but static shifted slices are
    # fine; packing widens the matmul K dim to fill the MXU.
    acc = jnp.zeros((t_out, 64), jnp.float32)
    for d in range(taps // pack):
        sl = x_ref[0, 0, d * pack : d * pack + t_out, :]
        acc = acc + jnp.dot(sl, k_ref[0, d], preferred_element_type=jnp.float32)
    o_ref[0, 0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "pack"))
def pos_conv_grouped(x: jnp.ndarray, kernel: jnp.ndarray, groups: int = 16,
                     pack: int = 4):
    """Grouped SAME conv, torch semantics (pad k//2 both sides, output
    length T+1 for even k — caller drops the trailing frame).

    x: [B, T, D]; kernel: flax layout [K, D//groups, D] (grouped). Returns
    [B, T + 1, D] in the compute dtype of ``x``.
    """
    B, T, D = x.shape
    K = kernel.shape[0]
    G = groups
    C = D // G
    assert C == 64 and kernel.shape == (K, C, D)
    t_out = T + 1
    t_out_pad = -(-t_out // 128) * 128
    pad = K // 2

    assert K % pack == 0
    # [B, G, T_slab, 64] (group leads so block last-two dims tile cleanly);
    # slab length must be t_out_pad + K (every output tap in range)
    xg = x.reshape(B, T, G, C).transpose(0, 2, 1, 3)
    right = (t_out_pad + K) - (T + pad)
    xg = jnp.pad(xg, ((0, 0), (0, 0), (pad, right), (0, 0)))
    if pack > 1:
        # stack ``pack`` consecutive time steps on the channel axis:
        # xp[t] = [x[t] | x[t+1] | … | x[t+pack-1]]
        t_slab = t_out_pad + K
        xg = jnp.concatenate(
            [xg[:, :, i : i + t_slab - (pack - 1)] for i in range(pack)],
            axis=-1,
        )
    # kernel [K, 64, D] → per-group packed [G, K//pack, 64*pack, 64]
    kg = kernel.reshape(K, C, G, C).transpose(2, 0, 1, 3).astype(x.dtype)
    kg = kg.reshape(G, K // pack, pack * C, C)

    out = pl.pallas_call(
        functools.partial(_kernel, taps=K, t_out=t_out_pad, pack=pack),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec(
                (1, 1, xg.shape[2], pack * C), lambda b, g: (b, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, K // pack, pack * C, C), lambda b, g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, t_out_pad, C), lambda b, g: (b, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, G, t_out_pad, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_out_pad * D * K * C,
            bytes_accessed=xg.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xg, kg)
    # [B, G, T_out, C] → [B, T_out, D]
    return out[:, :, :t_out].transpose(0, 2, 1, 3).reshape(B, t_out, D)
