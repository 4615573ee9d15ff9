"""Op-level parity vs torch primitives: GRU, MultiheadAttention, pooling."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from interspeech_ser_tpu.ops.attention import TorchMultiheadAttention, attention_pool
from interspeech_ser_tpu.ops.gru import BiGRU, gru_scan

RNG = np.random.default_rng(1)


def _np(t):
    return t.detach().numpy()


class TestGRUParity:
    def _make_torch_gru(self, in_dim, hidden, bidirectional=True):
        torch.manual_seed(3)
        return torch.nn.GRU(
            in_dim, hidden, batch_first=True, bidirectional=bidirectional
        )

    def test_forward_direction_matches_torch(self):
        B, T, I, H = 3, 17, 12, 8
        g = self._make_torch_gru(I, H, bidirectional=False)
        x = RNG.normal(size=(B, T, I)).astype(np.float32)
        with torch.no_grad():
            ref, _ = g(torch.tensor(x))
        ours = gru_scan(
            jnp.asarray(x),
            jnp.zeros((B, H), jnp.float32),
            jnp.asarray(_np(g.weight_ih_l0).T),
            jnp.asarray(_np(g.weight_hh_l0).T),
            jnp.asarray(_np(g.bias_ih_l0)),
            jnp.asarray(_np(g.bias_hh_l0)),
        )
        np.testing.assert_allclose(np.asarray(ours), _np(ref), atol=2e-6)

    def test_bidirectional_matches_torch(self):
        B, T, I, H = 2, 11, 10, 6
        g = self._make_torch_gru(I, H)
        x = RNG.normal(size=(B, T, I)).astype(np.float32)
        with torch.no_grad():
            ref, _ = g(torch.tensor(x))

        model = BiGRU(hidden_dim=H)
        params = {
            "w_ih_fwd": _np(g.weight_ih_l0).T,
            "w_hh_fwd": _np(g.weight_hh_l0).T,
            "b_ih_fwd": _np(g.bias_ih_l0),
            "b_hh_fwd": _np(g.bias_hh_l0),
            "w_ih_bwd": _np(g.weight_ih_l0_reverse).T,
            "w_hh_bwd": _np(g.weight_hh_l0_reverse).T,
            "b_ih_bwd": _np(g.bias_ih_l0_reverse),
            "b_hh_bwd": _np(g.bias_hh_l0_reverse),
        }
        ours = model.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), _np(ref), atol=2e-6)

    def test_masked_padded_equals_unpadded(self):
        """Padded+masked batched run == per-sequence unpadded runs."""
        I, H = 10, 6
        g = self._make_torch_gru(I, H)
        params = {
            "w_ih_fwd": _np(g.weight_ih_l0).T,
            "w_hh_fwd": _np(g.weight_hh_l0).T,
            "b_ih_fwd": _np(g.bias_ih_l0),
            "b_hh_fwd": _np(g.bias_hh_l0),
            "w_ih_bwd": _np(g.weight_ih_l0_reverse).T,
            "w_hh_bwd": _np(g.weight_hh_l0_reverse).T,
            "b_ih_bwd": _np(g.bias_ih_l0_reverse),
            "b_hh_bwd": _np(g.bias_hh_l0_reverse),
        }
        model = BiGRU(hidden_dim=H)
        lengths = [5, 9, 13]
        T = 16
        xs = [RNG.normal(size=(L, I)).astype(np.float32) for L in lengths]
        x_pad = np.zeros((3, T, I), np.float32)
        mask = np.zeros((3, T), np.float32)
        for i, (x, L) in enumerate(zip(xs, lengths)):
            x_pad[i, :L] = x
            mask[i, :L] = 1.0
        batched = np.asarray(
            model.apply({"params": params}, jnp.asarray(x_pad), jnp.asarray(mask))
        )
        for i, (x, L) in enumerate(zip(xs, lengths)):
            single = np.asarray(model.apply({"params": params}, jnp.asarray(x[None])))
            np.testing.assert_allclose(batched[i, :L], single[0], atol=2e-6)
            np.testing.assert_allclose(batched[i, L:], 0.0, atol=0)


class TestGRUDirectionStack:
    """gru_scan_bidir_stacked (one scan, both directions) must equal the
    two-scan path exactly — outputs AND gradients — incl. ragged masks."""

    def _params(self, I, H):
        g = torch.nn.GRU(I, H, batch_first=True, bidirectional=True)
        torch.manual_seed(5)
        return {
            "w_ih_fwd": _np(g.weight_ih_l0).T,
            "w_hh_fwd": _np(g.weight_hh_l0).T,
            "b_ih_fwd": _np(g.bias_ih_l0),
            "b_hh_fwd": _np(g.bias_hh_l0),
            "w_ih_bwd": _np(g.weight_ih_l0_reverse).T,
            "w_hh_bwd": _np(g.weight_hh_l0_reverse).T,
            "b_ih_bwd": _np(g.bias_ih_l0_reverse),
            "b_hh_bwd": _np(g.bias_hh_l0_reverse),
        }

    def test_output_equality_env_optin(self, monkeypatch):
        import jax

        B, T, I, H = 3, 19, 10, 6
        params = self._params(I, H)
        x = RNG.normal(size=(B, T, I)).astype(np.float32)
        mask = np.zeros((B, T), np.float32)
        for i, L in enumerate([7, 19, 12]):
            mask[i, :L] = 1.0
        model = BiGRU(hidden_dim=H)
        base = np.asarray(
            model.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask))
        )
        monkeypatch.setenv("SER_TPU_GRU_STACK", "1")
        stacked = jax.jit(
            lambda p, x_, m_: model.apply({"params": p}, x_, m_)
        )(params, jnp.asarray(x), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(stacked), base, atol=2e-6)

    def test_gradient_equality(self, monkeypatch):
        import jax

        B, T, I, H = 2, 13, 8, 5
        params = jax.tree.map(
            jnp.asarray, self._params(I, H)
        )
        x = jnp.asarray(RNG.normal(size=(B, T, I)).astype(np.float32))
        mask = jnp.asarray(
            (np.arange(T)[None, :] < np.array([9, 13])[:, None]).astype(np.float32)
        )
        model = BiGRU(hidden_dim=H)

        def loss(p, x_):
            out = model.apply({"params": p}, x_, mask)
            return jnp.sum(jnp.square(out) * jnp.cos(out))

        g_base = jax.grad(loss, argnums=(0, 1))(params, x)
        monkeypatch.setenv("SER_TPU_GRU_STACK", "1")
        g_stack = jax.grad(loss, argnums=(0, 1))(params, x)
        for a, b in zip(jax.tree.leaves(g_base), jax.tree.leaves(g_stack)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)


class TestMHAParity:
    def _convert(self, mha):
        return {
            "in_proj_kernel": _np(mha.in_proj_weight).T,
            "in_proj_bias": _np(mha.in_proj_bias),
            "out_kernel": _np(mha.out_proj.weight).T,
            "out_bias": _np(mha.out_proj.bias),
        }

    def test_matches_torch_1head(self):
        B, Tq, Tk, E = 2, 7, 9, 16
        torch.manual_seed(5)
        mha = torch.nn.MultiheadAttention(E, 1, batch_first=True)
        q = RNG.normal(size=(B, Tq, E)).astype(np.float32)
        k = RNG.normal(size=(B, Tk, E)).astype(np.float32)
        with torch.no_grad():
            ref, _ = mha(torch.tensor(q), torch.tensor(k), torch.tensor(k))
        model = TorchMultiheadAttention(embed_dim=E, num_heads=1)
        ours = model.apply(
            {"params": self._convert(mha)}, jnp.asarray(q), jnp.asarray(k), jnp.asarray(k)
        )
        np.testing.assert_allclose(np.asarray(ours), _np(ref), atol=2e-5)

    def test_matches_torch_2head_with_mask(self):
        B, Tq, Tk, E = 2, 5, 8, 16
        torch.manual_seed(6)
        mha = torch.nn.MultiheadAttention(E, 2, batch_first=True)
        q = RNG.normal(size=(B, Tq, E)).astype(np.float32)
        k = RNG.normal(size=(B, Tk, E)).astype(np.float32)
        key_mask = np.ones((B, Tk), np.float32)
        key_mask[0, 5:] = 0
        key_mask[1, 6:] = 0
        with torch.no_grad():
            ref, _ = mha(
                torch.tensor(q), torch.tensor(k), torch.tensor(k),
                key_padding_mask=torch.tensor(key_mask == 0),
            )
        model = TorchMultiheadAttention(embed_dim=E, num_heads=2)
        ours = model.apply(
            {"params": self._convert(mha)},
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(k),
            key_mask=jnp.asarray(key_mask),
        )
        np.testing.assert_allclose(np.asarray(ours), _np(ref), atol=2e-5)


class TestAttentionPool:
    def test_matches_reference_formula(self):
        B, T, D = 3, 9, 12
        feats = RNG.normal(size=(B, T, D)).astype(np.float32)
        w = RNG.normal(size=(D, 1)).astype(np.float32)
        b = RNG.normal(size=(1,)).astype(np.float32)
        scores = feats @ w + b
        ours = attention_pool(jnp.asarray(feats), jnp.asarray(scores))
        tw = torch.softmax(torch.tensor(scores), dim=1)
        ref = (torch.tensor(feats) * tw).sum(dim=1)
        np.testing.assert_allclose(np.asarray(ours), _np(ref), atol=1e-6)

    def test_masked_equals_truncated(self):
        B, T, D = 1, 9, 12
        feats = RNG.normal(size=(B, T, D)).astype(np.float32)
        scores = RNG.normal(size=(B, T, 1)).astype(np.float32)
        mask = np.zeros((B, T), np.float32)
        mask[:, :6] = 1
        masked = attention_pool(jnp.asarray(feats), jnp.asarray(scores), jnp.asarray(mask))
        trunc = attention_pool(jnp.asarray(feats[:, :6]), jnp.asarray(scores[:, :6]))
        np.testing.assert_allclose(np.asarray(masked), np.asarray(trunc), atol=1e-6)


class TestPatchMatmulConv:
    """Per-phase patch-matmul conv0 vs flax nn.Conv (VALID, 1 channel).

    Exactness across awkward lengths: single-output-frame inputs, lengths
    that don't divide the stride/phase grid, and long waveforms. (A
    blocked-Toeplitz relayout was tried and measured 2x WORSE on v5e —
    scripts/exp_conv0_anatomy.py — so the per-phase layout is canonical.)
    """

    def _ref(self, wav, kernel, bias):
        from flax import linen as nn

        conv = nn.Conv(
            kernel.shape[-1], (kernel.shape[0],), strides=(5,),
            padding="VALID", use_bias=bias is not None,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )
        params = {"kernel": jnp.asarray(kernel)}
        if bias is not None:
            params["bias"] = jnp.asarray(bias)
        return conv.apply({"params": params}, wav)

    @pytest.mark.parametrize("L", [10, 14, 55, 1280, 1283, 16000, 16007])
    def test_matches_conv_across_lengths(self, L):
        from interspeech_ser_tpu.models.speech import PatchMatmulConv

        rng = np.random.default_rng(L * 31)
        wav = jnp.asarray(rng.normal(size=(2, L, 1)).astype(np.float32))
        kernel = rng.normal(size=(10, 1, 24)).astype(np.float32) * 0.3
        bias = rng.normal(size=(24,)).astype(np.float32)

        mod = PatchMatmulConv(24, 10, 5, True, jnp.float32)
        got = mod.apply(
            {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}},
            wav,
        )
        want = self._ref(wav, kernel, bias)
        assert got.shape == want.shape == (2, (L - 10) // 5 + 1, 24)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_no_bias(self):
        from interspeech_ser_tpu.models.speech import PatchMatmulConv

        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.normal(size=(1, 407, 1)).astype(np.float32))
        kernel = rng.normal(size=(10, 1, 8)).astype(np.float32)
        mod = PatchMatmulConv(8, 10, 5, False, jnp.float32)
        got = mod.apply({"params": {"kernel": jnp.asarray(kernel)}}, wav)
        want = self._ref(wav, kernel, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


class TestFFNFused:
    """Fused-FFN Pallas pair (ops/pallas/ffn_fused.py): interpret-mode
    exactness vs the two-GEMM reference, ragged M padding, and the
    SER_TPU_FFN_KERNEL opt-in's param-tree/value identity."""

    def _ref(self, x, wu, bu, wd, bd, approx):
        import jax

        h = jax.nn.gelu(x @ wu + bu, approximate=approx)
        return h @ wd + bd

    @pytest.mark.parametrize("M,approx", [(256, True), (300, False), (7, True)])
    def test_matches_two_gemms(self, M, approx):
        import jax

        from interspeech_ser_tpu.ops.pallas.ffn_fused import ffn_fused

        rng = np.random.default_rng(M)
        K, F, N = 64, 256, 64
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        wu = jnp.asarray(rng.normal(size=(K, F)).astype(np.float32) * 0.05)
        bu = jnp.asarray(rng.normal(size=(F,)).astype(np.float32))
        wd = jnp.asarray(rng.normal(size=(F, N)).astype(np.float32) * 0.05)
        bd = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
        got = ffn_fused(x, wu, bu, wd, bd, block_m=128, approx_gelu=approx,
                        interpret=True)
        want = self._ref(x, wu, bu, wd, bd, approx)
        assert got.shape == (M, N)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_env_flag_exact_and_param_tree_identical(self, monkeypatch):
        import dataclasses

        import jax

        from interspeech_ser_tpu.models.speech import SpeechConfig, SpeechEncoderModel

        cfg = dataclasses.replace(
            SpeechConfig(
                hidden_size=32, num_layers=1, num_heads=4, intermediate_size=64,
                conv_dim=(16,), conv_kernel=(10,), conv_stride=(5,),
                conv_bias=True, feat_extract_norm="layer",
                do_stable_layer_norm=True, attention_type="wavlm",
                num_buckets=32, max_distance=64,
                num_conv_pos_embeddings=16, conv_pos_groups=4,
            ),
            inference_kernels=True,
        )
        m = SpeechEncoderModel(cfg)
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.normal(size=(2, 4000)).astype(np.float32))
        mask = jnp.ones((2, 4000), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), wav, mask)["params"]
        ref = m.apply({"params": params}, wav, mask)["last_hidden_state"]
        monkeypatch.setenv("SER_TPU_FFN_KERNEL", "1")
        got = m.apply({"params": params}, wav, mask)["last_hidden_state"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
        # init under the flag: same tree, same values (checkpoints swap
        # freely between the XLA and kernel paths)
        p2 = m.init(jax.random.PRNGKey(0), wav, mask)["params"]
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
        eq = jax.tree.map(lambda a, b: bool((a == b).all()), params, p2)
        assert all(jax.tree.leaves(eq))
