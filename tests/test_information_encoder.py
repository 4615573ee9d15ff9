"""Reference encoder classifier + timbre perturbation host op."""

import os
import sys

import numpy as np
import pytest

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


class TestFormantShiftFidelity:
    """Quantify the DSP approximation (the in-image substitute for Praat's
    'Change gender'; reference benchmark/utils/dataset/dataset.py:37-85).
    Praat itself is absent from this image, so the bound here is against
    the OPERATION'S DEFINITION: formant (spectral-envelope peak)
    frequencies must scale by the requested ratio. The parselmouth-gated
    test below measures true Praat divergence when the package exists."""

    def _vowel(self, sr=16000, f0=110.0, formants=(700.0, 1220.0), dur=0.6):
        t = np.arange(int(sr * dur)) / sr
        # impulse train through resonators ≈ vowel with known formants
        src = np.zeros_like(t)
        period = int(sr / f0)
        src[::period] = 1.0
        out = np.zeros_like(src)
        from scipy.signal import lfilter

        for F in formants:
            bw = 80.0
            r = np.exp(-np.pi * bw / sr)
            theta = 2 * np.pi * F / sr
            a = [1, -2 * r * np.cos(theta), r ** 2]
            out = out + lfilter([1.0], a, src)
        return (out / np.abs(out).max() * 0.5).astype(np.float32)

    def _logmel(self, wav, sr=16000, n_mels=80):
        from scipy.signal import stft

        f, t, Z = stft(wav, fs=sr, nperseg=512, noverlap=384)
        p = np.abs(Z) ** 2

        def hz2mel(h):
            return 2595 * np.log10(1 + h / 700)

        def mel2hz(m):
            return 700 * (10 ** (m / 2595) - 1)

        hpts = mel2hz(np.linspace(hz2mel(0), hz2mel(sr / 2), n_mels + 2))
        bins = np.floor((512 + 1) * hpts / sr).astype(int)
        fb = np.zeros((n_mels, p.shape[0]))
        for i in range(n_mels):
            lo, c, hi = bins[i], bins[i + 1], bins[i + 2]
            c = max(c, lo + 1)
            hi = max(hi, c + 1)
            fb[i, lo:c] = (np.arange(lo, c) - lo) / (c - lo)
            fb[i, c:hi] = (hi - np.arange(c, hi)) / (hi - c)
        return 10 * np.log10(np.maximum(fb @ p, 1e-10))

    def _msd(self, a, b):
        n = min(a.shape[1], b.shape[1])
        return float(np.mean(np.abs(a[:, :n] - b[:, :n])))

    def _envelope_peak(self, wav, sr, lo, hi):
        from scipy.signal import welch

        f, p = welch(wav, fs=sr, nperseg=1024)
        # smooth over ~190 Hz so harmonics merge into the envelope
        k = np.ones(13) / 13
        p = np.convolve(p, k, mode="same")
        band = (f >= lo) & (f <= hi)
        return float(f[band][np.argmax(p[band])])

    def test_envelope_peaks_scale_by_ratio(self):
        from interspeech_ser_tpu.train.information_encoder import _formant_shift_dsp

        sr = 16000
        wav = self._vowel(sr)
        for shift in (1.25, 1.0 / 1.25):
            out = _formant_shift_dsp(wav, sr, shift)
            # first formant: expected 700 Hz → 700·shift
            expected = 700.0 * shift
            got = self._envelope_peak(out, sr, expected * 0.7, expected * 1.3)
            rel_err = abs(got - expected) / expected
            assert rel_err < 0.12, (shift, got, expected)

    def test_mel_spectral_distance_to_ideal_shift(self):
        """Mel-domain bound: the DSP output must sit within 5.5 dB mean
        |log-mel| distance of a vowel synthesized DIRECTLY with shifted
        formants (same f0 — Praat's formant shift keeps pitch), and must
        be closer to that ideal target than the unshifted input is, at
        every (f0, formant-set, shift) case. The pre-r03 whole-spectrum
        warp failed the 'closer' criterion at f0 ≥ 180 Hz (it warps the
        harmonics too) with distances up to 9.9 dB."""
        from interspeech_ser_tpu.train.information_encoder import _formant_shift_dsp

        sr = 16000
        cases = [
            (110.0, (700.0, 1220.0)),
            (210.0, (850.0, 1610.0)),
            (120.0, (390.0, 1990.0)),
            (180.0, (450.0, 1000.0, 2400.0)),
        ]
        worst = 0.0
        for f0, F in cases:
            for shift in (1.25, 1.4, 1.0 / 1.25):
                wav = self._vowel(sr, f0=f0, formants=F)
                target = self._vowel(
                    sr, f0=f0, formants=tuple(x * shift for x in F)
                )
                out = _formant_shift_dsp(wav, sr, shift)
                m_out, m_tgt, m_in = (
                    self._logmel(out), self._logmel(target), self._logmel(wav)
                )
                d_out = self._msd(m_out, m_tgt)
                d_in = self._msd(m_in, m_tgt)
                worst = max(worst, d_out)
                assert d_out < d_in, (f0, F, shift, d_out, d_in)
        assert worst < 5.5, worst

    def test_praat_divergence_when_available(self):
        """Praat-vs-DSP divergence measurement — runs only where
        parselmouth is installed (documents the exact check to run when
        weights/deps arrive; see STATUS)."""
        pytest.importorskip("parselmouth")
        from interspeech_ser_tpu.train.information_encoder import (
            _formant_shift_dsp,
            timbre_perturb,
        )

        sr = 16000
        wav = self._vowel(sr)
        praat_out = timbre_perturb(wav, sr, formant_shift=1.25)
        dsp_out = _formant_shift_dsp(wav, sr, 1.25)
        n = min(len(praat_out), len(dsp_out))
        p1 = self._envelope_peak(np.asarray(praat_out)[:n], sr, 600, 1200)
        p2 = self._envelope_peak(dsp_out[:n], sr, 600, 1200)
        assert abs(p1 - p2) / p1 < 0.1


class TestReferenceEncoderTrainLoop:
    def test_trains_and_checkpoints(self, tmp_path):
        """Capability port of the reference's generic train() loop
        (src/information_encoder/utils.py:96-184)."""
        from interspeech_ser_tpu.train.information_encoder import (
            ReferenceEncoderClassifier,
            train_reference_encoder,
        )

        rng = np.random.default_rng(9)
        means = rng.normal(scale=2.0, size=(3, 16))

        def batches(n, seed):
            def gen():
                r = np.random.default_rng(seed)
                for _ in range(n):
                    y = r.integers(0, 3, size=8)
                    mel = r.normal(size=(8, 32, 16)).astype(np.float32) + means[y][:, None, :]
                    yield mel.astype(np.float32), y.astype(np.int64)
            return gen

        model = ReferenceEncoderClassifier(num_mel=16, embedding_dim=16, num_classes=3)
        params, tr_loss, va_loss, tr_acc, va_acc = train_reference_encoder(
            model, batches(6, 1), batches(2, 2), epochs=3, eval_epochs=1,
            lr=3e-3, save_model_path=str(tmp_path), checkpoint_every=10,
            log=lambda *_: None,
        )
        assert tr_acc[-1] > tr_acc[0] or tr_acc[-1] > 0.6
        assert any(f.startswith("best_model_") for f in os.listdir(tmp_path))
        assert any(f.startswith("checkpoint_") for f in os.listdir(tmp_path))
        # checkpoints are torch-loadable flat state dicts
        import torch as _torch

        f = sorted(f for f in os.listdir(tmp_path) if f.startswith("best_model_"))[0]
        sd = _torch.load(str(tmp_path / f), weights_only=True)
        assert any("recurrence" in k or "conv" in k for k in sd)
