"""Fused conv-frontend prefix kernel vs the XLA ConvFeatureExtractor.

The kernel recomputes each output tile straight from the waveform
(ops/pallas/conv_frontend.py), so parity must hold per fused depth,
dtype, bias setting, and at ragged lengths that leave a partial tail
tile. Reference semantics: HF Wav2Vec2FeatureEncoder 'layer' norm mode
(see models/speech.ConvFeatureExtractor)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interspeech_ser_tpu.models.speech import (
    ConvFeatureExtractor,
    SpeechConfig,
    SpeechEncoderModel,
)

RNG = np.random.default_rng(11)


def _cfg(dtype="float32", conv_bias=True):
    return SpeechConfig(
        hidden_size=64, num_layers=1, num_heads=4, intermediate_size=128,
        conv_dim=(32,) * 7, conv_bias=conv_bias, feat_extract_norm="layer",
        do_stable_layer_norm=True, attention_type="wavlm", dtype=dtype,
    )


class TestFusedConvFrontend:
    def _ab(self, cfg, n_fused, L, block_f=64, atol=2e-5):
        wav = jnp.asarray(RNG.normal(size=(2, L)).astype(np.float32) * 0.3)
        ref_mod = ConvFeatureExtractor(cfg)
        params = ref_mod.init(jax.random.PRNGKey(0), wav)["params"]
        ref = ref_mod.apply({"params": params}, wav)

        import interspeech_ser_tpu.ops.pallas.conv_frontend as cf

        old = cf.fused_conv_frontend

        def bounded(*a, **kw):
            kw.setdefault("block_f", block_f)
            return old(*a, **kw)

        cf_mod = ConvFeatureExtractor(cfg, fused_prefix=n_fused)
        try:
            cf.fused_conv_frontend = bounded
            ours = cf_mod.apply({"params": params}, wav)
        finally:
            cf.fused_conv_frontend = old
        np.testing.assert_allclose(
            np.asarray(ours, np.float32), np.asarray(ref, np.float32), atol=atol
        )

    @pytest.mark.parametrize("n_fused", [1, 2, 3, 7])
    def test_matches_xla_f32(self, n_fused):
        # 7 = the ENTIRE frontend in one pass (no intermediate ever
        # leaves the kernel)
        self._ab(_cfg(), n_fused, L=8000)

    def test_bf16_at_least_as_close_to_f32_truth(self):
        """bf16 roundings differ between the paths (the kernel keeps f32
        accumulation through bias+LN where XLA's conv rounds to bf16
        first), so compare BOTH against the f32 reference: the kernel
        must be at least as accurate, and close to the XLA-bf16 path."""
        wav = jnp.asarray(RNG.normal(size=(2, 8000)).astype(np.float32) * 0.3)
        cfg32, cfg16 = _cfg("float32"), _cfg("bfloat16")
        params = ConvFeatureExtractor(cfg32).init(jax.random.PRNGKey(0), wav)[
            "params"
        ]
        truth = np.asarray(
            ConvFeatureExtractor(cfg32).apply({"params": params}, wav), np.float32
        )
        xla16 = np.asarray(
            ConvFeatureExtractor(cfg16).apply({"params": params}, wav), np.float32
        )
        ker16 = np.asarray(
            ConvFeatureExtractor(cfg16, fused_prefix=2).apply(
                {"params": params}, wav
            ),
            np.float32,
        )
        err_xla = np.abs(xla16 - truth).mean()
        err_ker = np.abs(ker16 - truth).mean()
        assert err_ker <= err_xla * 1.1, (err_ker, err_xla)
        np.testing.assert_allclose(ker16, xla16, atol=8e-2)

    def test_no_bias(self):
        self._ab(_cfg(conv_bias=False), 2, L=8000)

    @pytest.mark.parametrize("L", [4003, 6401])
    def test_ragged_length_partial_tail_tile(self, L):
        self._ab(_cfg(), 2, L=L)

    def test_param_tree_identical(self):
        cfg = _cfg()
        wav = jnp.zeros((1, 4000), jnp.float32)
        p_ref = ConvFeatureExtractor(cfg).init(jax.random.PRNGKey(0), wav)["params"]
        p_fus = ConvFeatureExtractor(cfg, fused_prefix=2).init(
            jax.random.PRNGKey(0), wav
        )["params"]
        ref_shapes = jax.tree.map(lambda x: (x.shape, x.dtype), p_ref)
        fus_shapes = jax.tree.map(lambda x: (x.shape, x.dtype), p_fus)
        assert ref_shapes == fus_shapes

    def test_full_model_dispatch(self):
        """SpeechEncoderModel(fused_frontend=2) == default, same params."""
        cfg = _cfg()
        wav = jnp.asarray(RNG.normal(size=(2, 6400)).astype(np.float32) * 0.3)
        mask = np.ones((2, 6400), np.float32)
        mask[1, 4000:] = 0
        mask = jnp.asarray(mask)
        base = SpeechEncoderModel(cfg)
        params = base.init(jax.random.PRNGKey(0), wav, mask)["params"]
        ref = base.apply({"params": params}, wav, mask)["last_hidden_state"]
        fused = SpeechEncoderModel(cfg, fused_frontend=2)
        ours = fused.apply({"params": params}, wav, mask)["last_hidden_state"]
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=3e-5
        )
