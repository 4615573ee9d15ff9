"""Gradient parity: one-shot Pallas attention backward vs XLA autodiff.

``oneshot_attention_train`` (ops/pallas/attention_bwd.py) must match
autodiff through the f32 XLA reference on every cotangent — q, k, v, the
per-(b,h,q) gate, the shared [H,Tq,Tk] position bias — including ragged
key masks, and padded frames must receive exactly zero gradient.
Interpret mode on CPU; shapes are small but cover multi-head lane
slicing (hd=8, H=4) and non-128-multiple sequence lengths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interspeech_ser_tpu.ops.pallas.attention_bwd import (
    oneshot_attention_train,
)

RNG = np.random.default_rng(11)
NEG_INF = -1e30


def _xla_ref(q, k, v, num_heads, key_mask, gate, pos_bias):
    B, Tq, D = q.shape
    H = num_heads
    hd = D // H
    scale = hd ** -0.5
    qh = q.reshape(B, Tq, H, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh)
    if pos_bias is not None:
        b = pos_bias[None]
        if gate is not None:
            b = gate[:, :, :, None] * b
        s = s + b
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :] > 0, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(B, Tq, D)


def _setup(B=2, Tq=70, Tk=70, H=4, hd=8, bias=True, ragged=True):
    D = H * hd
    q = jnp.asarray(RNG.normal(size=(B, Tq, D)).astype(np.float32))
    k = jnp.asarray(RNG.normal(size=(B, Tk, D)).astype(np.float32))
    v = jnp.asarray(RNG.normal(size=(B, Tk, D)).astype(np.float32))
    if ragged:
        lens = [Tk, Tk - 17][:B] + [Tk - 5] * max(0, B - 2)
        key_mask = jnp.asarray(
            (np.arange(Tk)[None, :] < np.array(lens)[:, None]).astype(np.float32)
        )
    else:
        key_mask = None
    gate = pos_bias = None
    if bias:
        gate = jnp.asarray(
            (1.0 + RNG.normal(size=(B, H, Tq)) * 0.1).astype(np.float32)
        )
        pos_bias = jnp.asarray(RNG.normal(size=(H, Tq, Tk)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(B, Tq, D)).astype(np.float32))
    return q, k, v, key_mask, gate, pos_bias, w, H


def _grads(fn, q, k, v, key_mask, gate, pos_bias, w, H):
    def loss(q, k, v, gate, pos_bias):
        out = fn(q, k, v, H, key_mask, gate, pos_bias)
        return jnp.sum(out * w)

    argnums = (0, 1, 2) + ((3, 4) if pos_bias is not None else ())
    return jax.grad(loss, argnums=argnums)(q, k, v, gate, pos_bias)


def _kernel_fn(q, k, v, H, key_mask, gate, pos_bias):
    return oneshot_attention_train(
        q, k, v, H, key_mask=key_mask, gate=gate, pos_bias=pos_bias,
        interpret=True,
    )


def _ref_fn(q, k, v, H, key_mask, gate, pos_bias):
    return _xla_ref(q, k, v, H, key_mask, gate, pos_bias)


class TestOneshotAttentionBackward:
    @pytest.mark.parametrize("bias", [True, False])
    @pytest.mark.parametrize("ragged", [True, False])
    def test_grad_parity(self, bias, ragged):
        q, k, v, key_mask, gate, pos_bias, w, H = _setup(bias=bias, ragged=ragged)
        # forward parity first
        np.testing.assert_allclose(
            np.asarray(_kernel_fn(q, k, v, H, key_mask, gate, pos_bias)),
            np.asarray(_ref_fn(q, k, v, H, key_mask, gate, pos_bias)),
            atol=2e-5,
        )
        got = _grads(_kernel_fn, q, k, v, key_mask, gate, pos_bias, w, H)
        ref = _grads(_ref_fn, q, k, v, key_mask, gate, pos_bias, w, H)
        names = ["dq", "dk", "dv", "dgate", "dbias"][: len(ref)]
        for name, a, b in zip(names, got, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4,
                err_msg=name,
            )

    def test_masked_keys_get_zero_grad(self):
        q, k, v, key_mask, gate, pos_bias, w, H = _setup(ragged=True)
        dq, dk, dv, dgate, dbias = _grads(
            _kernel_fn, q, k, v, key_mask, gate, pos_bias, w, H
        )
        dead = np.asarray(key_mask) == 0
        np.testing.assert_array_equal(np.asarray(dk)[dead], 0.0)
        np.testing.assert_array_equal(np.asarray(dv)[dead], 0.0)

    def test_value_and_grad_jits(self):
        """The custom_vjp composes under jit (trace-time budget check ok)."""
        q, k, v, key_mask, gate, pos_bias, w, H = _setup(B=2, Tq=40, Tk=40)

        @jax.jit
        def vg(q, k, v, gate, pos_bias):
            def loss(q, k, v, gate, pos_bias):
                out = _kernel_fn(q, k, v, H, key_mask, gate, pos_bias)
                return jnp.sum(out * w)

            return jax.value_and_grad(loss, argnums=(0, 3))(q, k, v, gate, pos_bias)

        val, (dq, dgate) = vg(q, k, v, gate, pos_bias)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(dq)))
        assert np.all(np.isfinite(np.asarray(dgate)))

    def test_budget_error_raises(self):
        from interspeech_ser_tpu.ops.pallas.flash_attention_short import (
            VmemBudgetError,
        )

        q = jnp.zeros((1, 4096, 64), jnp.float32)
        with pytest.raises((VmemBudgetError, AssertionError)):
            oneshot_attention_train(q, q, q, 4, interpret=True)


class TestKernelChoiceOrdering:
    """A differentiable path must never receive the no-vjp inference
    kernel (attention_core review fix)."""

    def test_train_flag_shadows_inference_kernel(self):
        from interspeech_ser_tpu.ops.attention_core import (
            TRAIN_KERNEL_MIN_TK,
            _measured_kernel_choice,
        )

        # both opt-ins set: long Tk gets the differentiable pair, short
        # Tk falls back to XLA — NEVER the no-vjp oneshot2
        assert _measured_kernel_choice(True, True, TRAIN_KERNEL_MIN_TK) == "oneshot2_train"
        assert _measured_kernel_choice(True, True, 599) == "xla"
        assert _measured_kernel_choice(False, True, 599) == "xla"
        # inference-only configs keep the measured oneshot2 default
        assert _measured_kernel_choice(True, False, 599) == "oneshot2"
        assert _measured_kernel_choice(False, False, 9999) == "xla"

    def test_bool_mask_is_differentiable(self):
        """zeros_like cotangent on a bool mask would crash jax.grad; the
        public wrapper casts to float (attention_bwd review fix)."""
        from interspeech_ser_tpu.ops.pallas.attention_bwd import (
            oneshot_attention_train,
        )

        rng = np.random.default_rng(3)
        B, T, D, H = 2, 16, 32, 2
        q, k, v = (
            jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
            for _ in range(3)
        )
        mask = jnp.asarray(rng.random((B, T)) > 0.3)  # bool

        def loss(q):
            return jnp.sum(oneshot_attention_train(q, k, v, H, key_mask=mask) ** 2)

        g = jax.grad(loss)(q)
        assert np.isfinite(np.asarray(g)).all()

    def test_oversize_tk_raises_budget_error_without_grad(self):
        """Tk > MAX_ONESHOT_TK on a plain (non-differentiated) forward
        must raise VmemBudgetError so callers fall back to XLA, not an
        AssertionError (attention_bwd review fix)."""
        from interspeech_ser_tpu.ops.pallas.attention_bwd import (
            oneshot_attention_train,
        )
        from interspeech_ser_tpu.ops.pallas.flash_attention_short import (
            MAX_ONESHOT_TK,
            VmemBudgetError,
        )

        B, Tk, D, H = 1, MAX_ONESHOT_TK + 128, 128, 2
        q = jnp.zeros((B, 8, D), jnp.float32)
        k = jnp.zeros((B, Tk, D), jnp.float32)
        v = jnp.zeros((B, Tk, D), jnp.float32)
        with pytest.raises(VmemBudgetError):
            oneshot_attention_train(q, k, v, H)


class TestNestedShardMap:
    """attention_core's nested shard_map wrap of the differentiable pair.

    Under an active ops.kernel_context mesh (set by GSPMD train steps),
    the 'oneshot2_train' branch runs the pair per-shard over 'data'.
    Value and every cotangent — including the REPLICATED [H,Tq,Tk] shared
    bias, whose gradient must come back through shard_map's transpose
    psum — must match the plain single-device call.
    """

    def test_value_and_grad_parity(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from interspeech_ser_tpu.ops.attention_core import (
            dot_product_attention_btd,
        )
        from interspeech_ser_tpu.ops.kernel_context import kernel_mesh

        B, Tq, D, H = 8, 24, 32, 4
        q = jnp.asarray(RNG.normal(size=(B, Tq, D)).astype(np.float32))
        k = jnp.asarray(RNG.normal(size=(B, Tq, D)).astype(np.float32))
        v = jnp.asarray(RNG.normal(size=(B, Tq, D)).astype(np.float32))
        gate = jnp.asarray(RNG.normal(size=(B, H, Tq)).astype(np.float32))
        bias = jnp.asarray(RNG.normal(size=(H, Tq, Tq)).astype(np.float32))
        lengths = RNG.integers(8, Tq + 1, B)
        key_mask = jnp.asarray(
            (np.arange(Tq)[None, :] < lengths[:, None]).astype(np.float32)
        )
        w = jnp.asarray(RNG.normal(size=(B, Tq, D)).astype(np.float32))

        def loss(q, k, v, gate, bias):
            out = dot_product_attention_btd(
                q, k, v, H, key_mask=key_mask, gate=gate, shared_bias=bias,
                force_impl="oneshot2_train",
            )
            return jnp.sum(out * w)

        ref_v, ref_g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))(
            q, k, v, gate, bias
        )

        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        bsh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())

        def loss_mesh(q, k, v, gate, bias):
            with kernel_mesh(mesh):
                return loss(q, k, v, gate, bias)

        sh_v, sh_g = jax.jit(jax.value_and_grad(loss_mesh, argnums=(0, 1, 2, 3, 4)))(
            jax.device_put(q, bsh), jax.device_put(k, bsh),
            jax.device_put(v, bsh), jax.device_put(gate, bsh),
            jax.device_put(bias, repl),
        )
        np.testing.assert_allclose(float(sh_v), float(ref_v), rtol=1e-5)
        for name, a, b in zip(["q", "k", "v", "gate", "bias"], ref_g, sh_g):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5, err_msg=name
            )
