"""FACodec full decoder / redecoder: torch parity + codec consistency.

Torch helper modules mirror the reference architecture (cited in
models/ns3/facodec_decoder.py) and reuse the Snake/ResidualUnit torch
re-implementations from test_ns3_facodec.py.
"""

import math
import os
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from test_ns3_facodec import TorchResidualUnit, TorchSnakeAct, wn_conv

from interspeech_ser_tpu.models.ns3.facodec_decoder import (
    FACodecDecoderFull,
    FACodecRedecoder,
    HiFiGANDecoder,
    ResidualVQBank,
    conv_transpose1d_torch,
    ns3_decoder_full_params_from_torch,
    ns3_redecoder_params_from_torch,
    _hifigan_params,
)

RNG = np.random.default_rng(11)


def wn_convtrans(in_ch, out_ch, k, **kw):
    return torch.nn.utils.weight_norm(nn.ConvTranspose1d(in_ch, out_ch, k, **kw))


class TestConvTranspose:
    @pytest.mark.parametrize("stride", [2, 4, 5])
    def test_matches_torch(self, stride):
        s = stride
        tconv = wn_convtrans(6, 4, 2 * s, stride=s, padding=s // 2 + s % 2,
                             output_padding=s % 2)
        x = torch.from_numpy(RNG.normal(size=(2, 6, 13)).astype(np.float32))
        with torch.no_grad():
            ref = tconv(x).numpy()
        from interspeech_ser_tpu.models.ns3.facodec_decoder import (
            _fold_wn_convtranspose,
        )

        sd = {f"x.{k}": v.numpy() for k, v in tconv.state_dict().items()}
        w, b = _fold_wn_convtranspose(sd, "x")
        ours = conv_transpose1d_torch(
            jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(w),
            jnp.asarray(b), s, s // 2 + s % 2, s % 2,
        )
        assert ours.shape[1] == 13 * s  # exact T*s upsampling
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 2, 1), ref, atol=1e-5
        )


class TorchFVQ(nn.Module):
    """Reference FactorizedVectorQuantize (fvq.py), eval path."""

    def __init__(self, dim, codebook_dim, codebook_size):
        super().__init__()
        self.in_proj = torch.nn.utils.weight_norm(nn.Linear(dim, codebook_dim))
        self.out_proj = torch.nn.utils.weight_norm(nn.Linear(codebook_dim, dim))
        self._codebook = nn.Embedding(codebook_size, codebook_dim)

    def forward(self, z):  # z: [B, D, T]
        z_e = self.in_proj(z.transpose(1, 2))  # [B, T, d]
        enc = F.normalize(z_e.reshape(-1, z_e.shape[-1]))
        cb = F.normalize(self._codebook.weight)
        dist = (
            enc.pow(2).sum(1, keepdim=True) - 2 * enc @ cb.t()
            + cb.pow(2).sum(1, keepdim=True).t()
        )
        idx = (-dist).max(1)[1].reshape(z_e.shape[0], z_e.shape[1])
        z_q = self._codebook.weight[idx]  # decode_code, un-normalized
        z_q = self.out_proj(z_q)
        return z_q.transpose(1, 2), idx


class TorchRVQ(nn.Module):
    def __init__(self, n, dim, codebook_dim, codebook_size):
        super().__init__()
        self.layers = nn.ModuleList(
            TorchFVQ(dim, codebook_dim, codebook_size) for _ in range(n)
        )

    def forward(self, x):  # [B, D, T] eval path
        out, residual = 0.0, x
        codes = []
        for layer in self.layers:
            q, idx = layer(residual)
            residual = residual - q
            out = out + q
            codes.append(idx)
        return out, torch.stack(codes)


class TestResidualVQ:
    def test_matches_torch_eval(self):
        n, D, d, N = 3, 12, 4, 32
        trvq = TorchRVQ(n, D, d, N)
        x = torch.from_numpy(RNG.normal(size=(2, D, 9)).astype(np.float32))
        with torch.no_grad():
            ref_out, ref_codes = trvq(x)

        bank = ResidualVQBank(n, D, d, N)
        from interspeech_ser_tpu.models.ns3.facodec_decoder import _rvq_bank_params

        sd = {f"q.{k}": v.numpy() for k, v in trvq.state_dict().items()}
        params = _rvq_bank_params(sd, "q", n)
        xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
        out, codes, losses, each = bank.apply({"params": params}, xj)
        np.testing.assert_array_equal(np.asarray(codes), ref_codes.numpy())
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 2, 1), ref_out.numpy(), atol=2e-5
        )
        # vq2emb reproduces the quantized sum from codes alone
        emb = bank.apply(
            {"params": params}, params, jnp.asarray(np.asarray(codes)),
            method=ResidualVQBank.vq2emb,
        )
        np.testing.assert_allclose(np.asarray(emb), np.asarray(out), atol=2e-5)

    def test_training_ste_and_dropout(self):
        bank = ResidualVQBank(2, 8, 4, 16, quantizer_dropout=0.5)
        x = jnp.asarray(RNG.normal(size=(4, 6, 8)).astype(np.float32))
        params = bank.init(jax.random.PRNGKey(0), x)["params"]

        def loss_fn(xx):
            out, codes, losses, each = bank.apply(
                {"params": params}, xx, train=True, rng=jax.random.PRNGKey(1)
            )
            return jnp.sum(out ** 2) + jnp.sum(losses)

        g = jax.grad(loss_fn)(x)
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


class TorchDecoderBlock(nn.Module):
    def __init__(self, in_dim, out_dim, stride):
        super().__init__()
        s = stride
        self.block = nn.Sequential(
            TorchSnakeAct(in_dim),
            wn_convtrans(in_dim, out_dim, 2 * s, stride=s,
                         padding=s // 2 + s % 2, output_padding=s % 2),
            TorchResidualUnit(out_dim, 1),
            TorchResidualUnit(out_dim, 3),
            TorchResidualUnit(out_dim, 9),
        )

    def forward(self, x):
        return self.block(x)


class TorchHiFiGAN(nn.Module):
    """Reference decoder 'model' Sequential (facodec.py:332-348)."""

    def __init__(self, in_channels, channels, up_ratios):
        super().__init__()
        layers = [wn_conv(in_channels, channels, 7, padding=3)]
        for i, stride in enumerate(up_ratios):
            layers.append(
                TorchDecoderBlock(channels // 2 ** i, channels // 2 ** (i + 1), stride)
            )
        out_dim = channels // 2 ** len(up_ratios)
        layers += [TorchSnakeAct(out_dim), wn_conv(out_dim, 1, 7, padding=3), nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class TestHiFiGANDecoder:
    def test_matches_torch(self):
        up_ratios = (2, 5)
        tdec = TorchHiFiGAN(6, 16, up_ratios)
        x = torch.from_numpy(RNG.normal(size=(2, 6, 11)).astype(np.float32) * 0.5)
        with torch.no_grad():
            ref = tdec(x).numpy()

        sd = {k: v.numpy() for k, v in tdec.state_dict().items()}
        # rename TorchDecoderBlock's ".block" nesting to the reference's
        # "model.{i}.block.{j}" layout (already matches: model.1.block.0...)
        params = _hifigan_params(sd, "model", up_ratios)
        jdec = HiFiGANDecoder(6, 16, up_ratios)
        ours = jdec.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
        assert ours.shape == (2, 11 * 10)
        np.testing.assert_allclose(np.asarray(ours), ref[:, 0], atol=3e-5)


class TestFullDecoder:
    def test_autoencode_and_codes_roundtrip(self):
        dec = FACodecDecoderFull(
            in_channels=8, upsample_initial_channel=16, up_ratios=(2, 2),
            codebook_size=16, codebook_dim=4,
        )
        x = jnp.asarray(RNG.normal(size=(2, 7, 8)).astype(np.float32))
        variables = dec.init(jax.random.PRNGKey(0), x)
        wav, codes, losses = dec.apply(variables, x)
        assert wav.shape == (2, 7 * 4)
        assert codes.shape == (6, 2, 7)
        assert np.all(np.abs(np.asarray(wav)) <= 1.0)

        # decode-from-codes equals decode-from-quantized
        params = variables["params"]
        spk = dec.apply(variables, x, method=FACodecDecoderFull.speaker_embedding)
        wav2 = dec.apply(
            variables, params, jnp.asarray(np.asarray(codes)), spk,
            method=FACodecDecoderFull.codes_to_wav,
        )
        np.testing.assert_allclose(np.asarray(wav), np.asarray(wav2), atol=1e-5)

    def test_predictors(self):
        dec = FACodecDecoderFull(
            in_channels=8, upsample_initial_channel=16, up_ratios=(2, 2),
            codebook_size=16, codebook_dim=4, with_predictors=True,
        )
        x = jnp.asarray(RNG.normal(size=(1, 5, 8)).astype(np.float32))
        variables = dec.init(jax.random.PRNGKey(0), x)
        quantized, codes, _ = dec.apply(
            variables, x, method=FACodecDecoderFull.quantize
        )
        out = dec.apply(variables, quantized, method=FACodecDecoderFull.predict)
        assert out["f0"].shape == (1, 5)
        assert out["phone"].shape == (1, 5, 5003)


class TestRedecoder:
    def test_forward_and_speaker_swap(self):
        red = FACodecRedecoder(
            in_channels=8, upsample_initial_channel=16, up_ratios=(2, 2),
            codebook_size=16,
        )
        codes = jnp.asarray(RNG.integers(0, 16, size=(6, 2, 7)))
        spk_a = jnp.asarray(RNG.normal(size=(2, 8)).astype(np.float32))
        spk_b = jnp.asarray(RNG.normal(size=(2, 8)).astype(np.float32))
        variables = red.init(jax.random.PRNGKey(0), codes, spk_a)
        wav_a = red.apply(variables, codes, spk_a)
        wav_b = red.apply(variables, codes, spk_b)
        assert wav_a.shape == (2, 7 * 4)
        # speaker conditioning must actually change the output
        assert float(jnp.max(jnp.abs(wav_a - wav_b))) > 1e-6
        wav_r = red.apply(variables, codes, spk_a, use_residual=True)
        assert float(jnp.max(jnp.abs(wav_a - wav_r))) > 1e-6


class TestQuantizeV2:
    def test_prosody_bank_uses_melspec_latents(self):
        """V2 quantize: prosody bank sees the melspec-encoded latents, not
        x (reference facodec.py:1076-1116)."""
        dec = FACodecDecoderFull(
            in_channels=8, upsample_initial_channel=16, up_ratios=(2, 2),
            codebook_size=16, codebook_dim=4,
        )
        x = jnp.asarray(RNG.normal(size=(2, 7, 8)).astype(np.float32))
        pros = jnp.asarray(RNG.normal(size=(2, 7, 8)).astype(np.float32))
        variables = dec.init(jax.random.PRNGKey(0), x)
        (qp, qc, qr), codes, losses = dec.apply(
            variables, x, pros, method=FACodecDecoderFull.quantize_v2
        )
        assert codes.shape == (6, 2, 7)
        # same prosody latents -> same prosody codes regardless of x
        x2 = jnp.asarray(RNG.normal(size=(2, 7, 8)).astype(np.float32))
        (_, _, _), codes2, _ = dec.apply(
            variables, x2, pros, method=FACodecDecoderFull.quantize_v2
        )
        np.testing.assert_array_equal(np.asarray(codes[0]), np.asarray(codes2[0]))
        # content codes DO depend on x
        assert not np.array_equal(np.asarray(codes[1]), np.asarray(codes2[1]))
