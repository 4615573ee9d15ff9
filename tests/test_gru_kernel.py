"""Pallas GRU sequence kernel vs the lax.scan reference (interpret mode)."""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.ops.gru import gru_scan
from interspeech_ser_tpu.ops.pallas.gru_kernel import gru_sequence

RNG = np.random.default_rng(19)


def _setup(B=4, T=23, I=12, H=8):
    x = jnp.asarray(RNG.normal(size=(B, T, I)).astype(np.float32))
    w_ih = jnp.asarray(RNG.normal(size=(I, 3 * H)).astype(np.float32) * 0.3)
    w_hh = jnp.asarray(RNG.normal(size=(H, 3 * H)).astype(np.float32) * 0.3)
    b_ih = jnp.asarray(RNG.normal(size=(3 * H,)).astype(np.float32) * 0.1)
    b_hh = jnp.asarray(RNG.normal(size=(3 * H,)).astype(np.float32) * 0.1)
    x_proj = jnp.einsum("bti,ih->bth", x, w_ih) + b_ih
    return x, x_proj, w_ih, w_hh, b_ih, b_hh, B, H


class TestGRUKernel:
    def test_matches_scan_forward(self):
        x, x_proj, w_ih, w_hh, b_ih, b_hh, B, H = _setup()
        ref = gru_scan(x, jnp.zeros((B, H)), w_ih, w_hh, b_ih, b_hh)
        ours = gru_sequence(x_proj, w_hh, b_hh, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)

    def test_matches_scan_reverse_masked(self):
        x, x_proj, w_ih, w_hh, b_ih, b_hh, B, H = _setup(T=17)
        mask = np.zeros((B, 17), np.float32)
        for i, l in enumerate((17, 11, 5, 9)):
            mask[i, :l] = 1
        ref = gru_scan(
            x, jnp.zeros((B, H)), w_ih, w_hh, b_ih, b_hh,
            mask=jnp.asarray(mask), reverse=True,
        )
        ours = gru_sequence(
            x_proj, w_hh, b_hh, mask=jnp.asarray(mask), reverse=True, interpret=True
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


class TestBiGRUFusedKernel:
    def test_bigru_use_kernel_matches_scan(self):
        import jax

        from interspeech_ser_tpu.ops.gru import BiGRU

        B, T, I, H = 3, 19, 10, 8
        x = jnp.asarray(RNG.normal(size=(B, T, I)).astype(np.float32))
        mask = np.zeros((B, T), np.float32)
        for i, l in enumerate((19, 12, 7)):
            mask[i, :l] = 1
        model = BiGRU(hidden_dim=H)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        ref = model.apply({"params": params}, x, jnp.asarray(mask))
        ours = model.apply({"params": params}, x, jnp.asarray(mask), use_kernel=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=3e-5)

    def test_bigru_kernel_grads_match_scan(self):
        """custom_vjp backward == autodiff-through-scan backward.

        Covers every cotangent: params (w_ih/w_hh/b_ih/b_hh both
        directions) AND the input sequence, with ragged masking so the
        carry-freeze gradient path is exercised.
        """
        from interspeech_ser_tpu.ops.gru import BiGRU

        B, T, I, H = 3, 17, 10, 8
        x = jnp.asarray(RNG.normal(size=(B, T, I)).astype(np.float32))
        mask = np.zeros((B, T), np.float32)
        for i, l in enumerate((17, 11, 6)):
            mask[i, :l] = 1
        mask = jnp.asarray(mask)
        model = BiGRU(hidden_dim=H)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        # weight the loss per position so output cotangents are non-uniform
        w = jnp.asarray(RNG.normal(size=(B, T, 2 * H)).astype(np.float32))

        def loss(p, x_, use_kernel):
            out = model.apply({"params": p}, x_, mask, use_kernel=use_kernel)
            return jnp.sum(out * w) + jnp.sum(jnp.tanh(out))

        g_ref = jax.grad(loss, argnums=(0, 1))(params, x, False)
        g_ker = jax.grad(loss, argnums=(0, 1))(params, x, True)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_ker = jax.tree_util.tree_leaves(g_ker)
        for (path, a), b in zip(flat_ref, flat_ker):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-5,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
            )

    def test_bigru_kernel_grads_zero_beyond_mask(self):
        """No gradient may flow to inputs at padded frames."""
        from interspeech_ser_tpu.ops.gru import BiGRU

        B, T, I, H = 2, 11, 6, 8
        x = jnp.asarray(RNG.normal(size=(B, T, I)).astype(np.float32))
        mask = np.ones((B, T), np.float32)
        mask[1, 7:] = 0
        model = BiGRU(hidden_dim=H)
        params = model.init(jax.random.PRNGKey(1), x)["params"]

        def loss(x_):
            out = model.apply(
                {"params": params}, x_, jnp.asarray(mask), use_kernel=True
            )
            return jnp.sum(out ** 2)

        gx = np.asarray(jax.grad(loss)(x))
        assert np.abs(gx[1, 7:]).max() == 0.0


class TestPosConvKernel:
    def test_matches_xla_grouped_conv(self):
        """Pallas pos-conv == XLA grouped conv (f32, interpret on CPU)."""
        from interspeech_ser_tpu.ops.pallas.pos_conv import pos_conv_grouped

        rng = np.random.default_rng(4)
        B, T, D, G, K = 2, 37, 128, 2, 8
        # kernel API asserts 64-ch groups; use the production group width
        B, T, D, G, K = 2, 37, 128, 2, 8
        x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
        kernel = jnp.asarray(
            (rng.normal(size=(K, D // G, D)) * 0.1).astype(np.float32)
        )
        ref = jax.lax.conv_general_dilated(
            x, kernel, (1,), [(K // 2, K // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=G,
        )
        ours = pos_conv_grouped(x, kernel, groups=G)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
