"""Shared scaled-dot-product attention core for the encoder zoo.

Single swap point between the XLA einsum path and the Pallas
flash-attention kernel. Measured on v5e, XLA's fused attention wins at
every encoder-zoo shape (0.82 vs 1.82 ms at WavLM B16/H16/T512/D64;
5.65 vs 8.32 ms at Whisper B8/H20/T1504) — XLA keeps the score tile
register-resident and D=64 half-fills the MXU either way — so XLA is the
default and the kernel is opt-in (SER_TPU_FORCE_FLASH=1 / force_impl)
for future long-sequence or memory-bound regimes. The official
jax.experimental.pallas.ops.tpu kernels do not compile under this
image's remote-compile tunnel (HTTP 413 payload limit).

Bias comes FACTORED: ``gate [B,H,Tq]`` × ``shared_bias [H,Tq,Tk]``
(WavLM's gated relative position bias, reference semantics in
models/speech.py). Plain additive bias is the special case gate=1.

The softmax always runs in float32; in bf16 mode the score/bias chain
before it deliberately stays bf16 (measured parity holds — see
dot_product_attention's acc_t), while f32 mode is exact end-to-end
(SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from .kernel_context import active_kernel_mesh

NEG_INF = -1e30

# Minimum key length for the differentiable one-shot pair to engage as a
# training default (scripts/exp_attn_bwd.py: win at 1500, loss at 599).
TRAIN_KERNEL_MIN_TK = 1024

# Measured on v5e (B16 H16 T512 D64, gated bias): XLA 0.82 ms vs the
# recurrent Pallas flash kernel 1.82 ms — XLA's native attention fusion
# wins at encoder-zoo shapes (D=64 half-fills the MXU and the score tile
# stays in registers), so 'flash' stays opt-in for long-sequence regimes.
# The one-shot short-T kernel (flash_attention_short.py) beat XLA by
# ~6-9% at the isolated WavLM SDPA shape (2.51 vs 2.66 ms, B32 H16 T499)
# but is VPU-bound on the softmax chain like XLA; selection is decided by
# the measured END-TO-END extraction number (see the kernel's docstring).
def pick_impl(tq: int, tk: int, force_impl: Optional[str]) -> str:
    if force_impl is not None:
        return force_impl
    env = os.environ.get("SER_TPU_ATTN_IMPL")
    if env:
        return env
    if jax.default_backend() == "cpu":
        return "xla"  # interpret mode is test-only; XLA is faster on host
    if os.environ.get("SER_TPU_FORCE_FLASH") == "1":
        return "flash"
    return "xla"


def under_manual_axis(axis: str = "data") -> bool:
    """True when tracing inside ``shard_map`` with ``axis`` bound.

    A Pallas custom call does not auto-partition under GSPMD
    (jit + NamedSharding), but under shard_map each device traces the
    per-shard program where the kernel is plain local compute — so the
    measured-default kernels may engage there too. ``axis_index`` raises
    outside a mapped context; inside, it traces a (DCE'd) index op.
    """
    try:
        jax.lax.axis_index(axis)
        return True
    except Exception:
        return False


def _measured_kernel_choice(
    allow_kernel: bool, allow_train_kernel: bool, tk: int
) -> str:
    """Which measured-default kernel a bf16 single-device/shard path gets.

    Ordering matters: a path that may be differentiated
    (``allow_train_kernel``) must NEVER get the no-vjp inference kernel —
    a config carrying both opt-ins (e.g. an extraction config handed to a
    fine-tune engine) would otherwise crash jax.grad with
    'differentiation rule for pallas_call not implemented'. So the
    differentiable pair is considered first, and when it is Tk-gated off
    the path falls back to XLA, not to the inference kernel.
    """
    if allow_train_kernel:
        return "oneshot2_train" if tk >= TRAIN_KERNEL_MIN_TK else "xla"
    if allow_kernel:
        return "oneshot2"
    return "xla"


def dot_product_attention_btd(
    q: jnp.ndarray,  # [B, Tq, D] — projection layout, D = H * hd
    k: jnp.ndarray,  # [B, Tk, D]
    v: jnp.ndarray,  # [B, Tk, D]
    num_heads: int,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    gate: Optional[jnp.ndarray] = None,  # [B, H, Tq]
    shared_bias: Optional[jnp.ndarray] = None,  # [H, Tq, Tk]
    force_impl: Optional[str] = None,
    allow_kernel: bool = False,
    allow_train_kernel: bool = False,
) -> jnp.ndarray:  # [B, Tq, D]
    """SDPA on [B, T, D] projection outputs (heads never materialized).

    The 'oneshot2' Pallas kernel consumes the projection layout directly
    (head = lane-column slice via the BlockSpec index map), so no
    [B, H, T, hd] transposes exist around the custom call — the v1
    kernel's e2e regression. Other impls reshape/transpose here and XLA
    fuses those into the surrounding einsums as before.

    ``allow_kernel`` is the INFERENCE opt-in (set from
    ``SpeechConfig/WhisperEncoderConfig.inference_kernels`` by extraction
    pipelines and benches): the kernel has no vjp, so it must never
    auto-select on a path an engine may differentiate — training engines
    leave it False and always get XLA. ``SER_TPU_ATTN_IMPL``/
    ``force_impl`` still force any impl for experiments.

    ``allow_train_kernel`` is the TRAINING opt-in (set from
    ``WhisperEncoderConfig.train_kernels``): it selects the
    DIFFERENTIABLE custom_vjp pair (ops/pallas/attention_bwd.py), so it
    is safe on paths an engine differentiates. Measured default
    (scripts/exp_attn_bwd.py, real v5e, bf16): Whisper-encoder fine-tune
    step 1.279x vs XLA autodiff (364.8 -> 285.2 ms at B4/T1500); WavLM
    fine-tune 0.962x (B8/Tk=599, gated bias) — so the pair engages only
    at long key lengths (Tk >= TRAIN_KERNEL_MIN_TK).
    """
    B, Tq, D = q.shape
    H = num_heads
    hd = D // H
    impl = pick_impl(Tq, k.shape[1], force_impl)
    if (
        impl == "xla"
        and force_impl is None
        and os.environ.get("SER_TPU_ATTN_IMPL") is None
        and q.dtype == jnp.bfloat16
        and jax.default_backend() not in ("cpu",)
    ):
        # Measured defaults (single device, or per-shard under shard_map
        # where the custom call is local compute; plain GSPMD-sharded
        # meshes keep XLA because a Pallas call does not auto-partition):
        # - oneshot2 wins WavLM-large extraction 274.2 vs 252.9 utt/s
        #   (scripts/exp_attn_btd.py);
        # - the differentiable pair wins whisper fine-tune 1.279x at
        #   Tk=1500 but loses wavlm 0.962x at Tk=599 — Tk-gated
        #   (scripts/exp_attn_bwd.py).
        if len(jax.devices()) == 1 or under_manual_axis():
            impl = _measured_kernel_choice(
                allow_kernel, allow_train_kernel, k.shape[1]
            )
        elif allow_train_kernel and active_kernel_mesh() is not None:
            # GSPMD train step with an active kernel-mesh context
            # (ops/kernel_context.py): only the DIFFERENTIABLE pair may
            # engage — it gets a nested shard_map wrap below. The no-vjp
            # inference kernel never engages here (an unwrapped Pallas
            # call cannot partition under GSPMD).
            impl = _measured_kernel_choice(False, True, k.shape[1])
    if impl == "oneshot2":
        from .pallas.flash_attention_short import (
            MAX_ONESHOT_TK,
            VmemBudgetError,
            attention_btd,
        )

        # Experiment (SER_TPU_PAD_HEADS=1): zero-pad each head's lane
        # slice to the 128-lane tile (hd=120 → 128 for w2v2-XLS-R-2B,
        # where oneshot2 measured dead even vs XLA). Exact: padded q·k
        # lanes contribute 0 to scores, padded v lanes produce 0 output
        # columns that are sliced off; the MXU pads the contraction to
        # 128 regardless, so the extra lanes cost only the reshape/pad
        # data movement. Scale is resolved from the REAL hd first.
        if (
            os.environ.get("SER_TPU_PAD_HEADS") == "1"
            and hd % 128 != 0
            and k.shape[1] <= MAX_ONESHOT_TK
        ):
            hd_pad = ((hd + 127) // 128) * 128
            real_scale = scale if scale is not None else 1.0 / (hd ** 0.5)

            def pad_heads(x):
                xh = x.reshape(B, x.shape[1], H, hd)
                xh = jnp.pad(xh, ((0, 0), (0, 0), (0, 0), (0, hd_pad - hd)))
                return xh.reshape(B, x.shape[1], H * hd_pad)

            try:
                out = attention_btd(
                    pad_heads(q), pad_heads(k), pad_heads(v), num_heads,
                    key_mask=key_mask, scale=real_scale,
                    gate=gate, pos_bias=shared_bias,
                )
                out = out.reshape(B, Tq, H, hd_pad)[..., :hd]
                return out.reshape(B, Tq, D)
            except VmemBudgetError:
                pass
        if k.shape[1] <= MAX_ONESHOT_TK:
            try:
                return attention_btd(
                    q, k, v, num_heads, key_mask=key_mask, scale=scale,
                    gate=gate, pos_bias=shared_bias,
                )
            except VmemBudgetError:
                pass
        impl = "xla"
    if impl == "oneshot2_train":
        # DIFFERENTIABLE one-shot pair (custom_vjp Pallas backward,
        # ops/pallas/attention_bwd.py) — experiment opt-in via
        # SER_TPU_ATTN_IMPL=oneshot2_train / force_impl until the
        # training-step A/B (scripts/exp_attn_bwd.py) decides a default.
        from .pallas.attention_bwd import oneshot_attention_train
        from .pallas.flash_attention_short import VmemBudgetError

        try:
            mesh = active_kernel_mesh()
            if mesh is not None and mesh.size > 1 and not under_manual_axis():
                # GSPMD surroundings: run the pair per-shard over 'data'.
                # q/k/v/mask/gate are per-sample along batch; the shared
                # [H, Tq, Tk] bias is replicated and its cotangent comes
                # back through shard_map's transpose psum (parity pinned
                # in tests/test_attention_bwd.py::TestNestedShardMap).
                from jax.sharding import PartitionSpec as P

                def _local(q_, k_, v_, mask_, gate_, bias_):
                    return oneshot_attention_train(
                        q_, k_, v_, num_heads, key_mask=mask_, scale=scale,
                        gate=gate_, pos_bias=bias_,
                    )

                return jax.shard_map(
                    _local, mesh=mesh,
                    in_specs=(P("data"), P("data"), P("data"), P("data"),
                              P("data"), P()),
                    out_specs=P("data"), check_vma=False,
                )(q, k, v, key_mask, gate, shared_bias)
            return oneshot_attention_train(
                q, k, v, num_heads, key_mask=key_mask, scale=scale,
                gate=gate, pos_bias=shared_bias,
            )
        except VmemBudgetError:
            impl = "xla"
    qh = q.reshape(B, Tq, H, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
    out = dot_product_attention(
        qh, kh, vh, key_mask=key_mask, scale=scale, gate=gate,
        shared_bias=shared_bias, force_impl=impl,
    )
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, D)


def dot_product_attention(
    q: jnp.ndarray,  # [B, H, Tq, Dh]
    k: jnp.ndarray,  # [B, H, Tk, Dh]
    v: jnp.ndarray,  # [B, H, Tk, Dh]
    bias: Optional[jnp.ndarray] = None,  # [B, H, Tq, Tk] pre-materialized
    key_mask: Optional[jnp.ndarray] = None,  # [B, Tk], 1 = attend
    scale: Optional[float] = None,
    gate: Optional[jnp.ndarray] = None,  # [B, H, Tq] factored-bias gate
    shared_bias: Optional[jnp.ndarray] = None,  # [H, Tq, Tk] factored bias
    force_impl: Optional[str] = None,  # 'xla' | 'flash'
) -> jnp.ndarray:
    """Masked SDPA with optional (factored) additive bias; f32 softmax."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    assert bias is None or shared_bias is None

    impl = pick_impl(q.shape[2], k.shape[2], force_impl)
    if impl == "flash" and bias is None:
        from .pallas.flash_attention import flash_attention

        return flash_attention(
            q, k, v, key_mask=key_mask, scale=scale, gate=gate, pos_bias=shared_bias
        )
    if impl == "oneshot" and bias is None:
        from .pallas.flash_attention_short import MAX_ONESHOT_TK, attention_bhtd

        if k.shape[2] <= MAX_ONESHOT_TK:
            return attention_bhtd(
                q, k, v, key_mask=key_mask, scale=scale, gate=gate,
                pos_bias=shared_bias,
            )

    dtype = q.dtype
    # bf16 mode keeps the score/bias chain in bf16 (softmax still f32):
    # measured on v5e this is the difference between bf16 being 16% SLOWER
    # than f32 (f32 [B,H,T,T] bias materialization breaks fusion) and 30%
    # faster (204 vs 156 utt/s WavLM-large extraction). f32 mode is
    # untouched — bit-parity path.
    acc_t = jnp.float32 if dtype == jnp.float32 else dtype
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=acc_t
    )
    if shared_bias is not None:
        b = shared_bias[None].astype(acc_t)
        if gate is not None:
            b = gate[:, :, :, None].astype(acc_t) * b
        scores = scores + b
    elif bias is not None:
        scores = scores + bias.astype(acc_t)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :].astype(bool), scores, NEG_INF)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32).astype(
        dtype
    )
