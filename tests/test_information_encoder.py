"""Reference encoder classifier + timbre perturbation host op."""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.train.information_encoder import (
    ReferenceEncoderClassifier,
    fixed_timbre_perturb,
    formant_shift_sampler,
    sliced_timbre_perturb,
)

RNG = np.random.default_rng(16)


class TestReferenceEncoder:
    def test_forward_shapes(self):
        model = ReferenceEncoderClassifier(num_mel=80, embedding_dim=64, num_classes=5)
        mel = jnp.asarray(RNG.normal(size=(2, 128, 80)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), mel)
        out = model.apply(variables, mel)
        assert out.shape == (2, 5)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_nonlinear_proj_variant(self):
        model = ReferenceEncoderClassifier(
            num_mel=40, embedding_dim=32, num_classes=3, use_nonlinear_proj=True
        )
        mel = jnp.asarray(RNG.normal(size=(1, 64, 40)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(1), mel)
        out = model.apply(variables, mel)
        assert out.shape == (1, 3)


class TestTimbrePerturb:
    def test_sampler_range(self):
        rng = np.random.default_rng(0)
        vals = [formant_shift_sampler(1.4, rng) for _ in range(200)]
        assert all(1 / 1.4 - 1e-6 <= v <= 1.4 + 1e-6 for v in vals)
        assert any(v < 1 for v in vals) and any(v > 1 for v in vals)

    def test_fixed_perturb_preserves_shape_and_changes_signal(self):
        rng = np.random.default_rng(1)
        wav = np.sin(np.arange(16000) * 0.05).astype(np.float32)
        out = fixed_timbre_perturb(wav, 16000, rng=rng)
        assert out.shape == wav.shape
        assert np.isfinite(out).all()

    def test_sliced_perturb_length(self):
        rng = np.random.default_rng(2)
        wav = RNG.normal(size=20000).astype(np.float32) * 0.1
        out = sliced_timbre_perturb(wav, 16000, segment_size=8000, rng=rng)
        assert abs(len(out) - len(wav)) <= 1
