"""Log-mel spectrogram frontends in JAX (matmul-DFT, MXU-friendly).

Whisper frontend parity target: the HF ``WhisperFeatureExtractor`` numpy
path (n_fft 400, hop 160, periodic hann, reflect pad, power-2 spectrogram,
slaney mel bank 0-8 kHz, log10, per-sample max-8 clamp, (x+4)/4 scaling) —
reference usage: preprocessing/preprocess_whisper.py:48-57. The FACodec
80-mel frontend (n_fft 1024, hop 200, win 800; reference src/ns3/melspec.py)
reuses the same machinery.

Design: an STFT as one big framed matmul against fixed DFT bases — on TPU
this rides the MXU and fuses with the mel projection; no FFT primitive
needed at these sizes (n_fft ≤ 1024).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def hz_to_mel_slaney(freq):
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    with np.errstate(divide="ignore"):
        log_branch = min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) * logstep
    return np.where(freq >= min_log_hz, log_branch, mels)


def mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(mels >= min_log_mel, 1000.0 * np.exp(logstep * (mels - min_log_mel)), freq)


def mel_filter_bank_slaney(
    num_frequency_bins: int,
    num_mel_filters: int,
    min_frequency: float,
    max_frequency: float,
    sampling_rate: int,
    norm: Optional[str] = "slaney",
) -> np.ndarray:
    """Triangular slaney-scale mel bank, [num_frequency_bins, num_mel]."""
    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)
    mel_min = hz_to_mel_slaney(min_frequency)
    mel_max = hz_to_mel_slaney(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = mel_to_hz_slaney(mel_freqs)

    fdiff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]  # [bins, mel+2]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (filter_freqs[2 : num_mel_filters + 2] - filter_freqs[:num_mel_filters])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int, periodic_hann: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    n = np.arange(n_fft)
    k = np.arange(1 + n_fft // 2)
    angle = 2.0 * np.pi * np.outer(n, k) / n_fft
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft)) if periodic_hann else np.hanning(n_fft)
    cos_b = (np.cos(angle) * win[:, None]).astype(np.float32)
    sin_b = (-np.sin(angle) * win[:, None]).astype(np.float32)
    return cos_b, sin_b


def stft_power(
    wav: jnp.ndarray,  # [B, L]
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    center: bool = True,
    periodic_hann: bool = True,
) -> jnp.ndarray:
    """Power spectrogram [B, num_frames, 1 + n_fft//2] in float32.

    num_frames = 1 + L // hop (center=True, reflect pad n_fft//2).
    ``win_length < n_fft`` zero-pads the window symmetrically (torch.stft
    semantics, used by the FACodec melspec).
    """
    assert wav.ndim == 2
    wav = wav.astype(jnp.float32)
    if center:
        pad = n_fft // 2
        wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    B, L = wav.shape
    num_frames = 1 + (L - n_fft) // hop_length
    idx = np.arange(num_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = wav[:, jnp.asarray(idx)]  # [B, F, n_fft]

    cos_b, sin_b = _dft_bases(n_fft, periodic_hann)
    if win_length is not None and win_length < n_fft:
        # window defined on win_length, centered inside the n_fft frame
        n = np.arange(win_length)
        w = (
            0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
            if periodic_hann
            else np.hanning(win_length)
        )
        wfull = np.zeros(n_fft)
        off = (n_fft - win_length) // 2
        wfull[off : off + win_length] = w
        nfull = np.arange(n_fft)
        k = np.arange(1 + n_fft // 2)
        angle = 2.0 * np.pi * np.outer(nfull, k) / n_fft
        cos_b = (np.cos(angle) * wfull[:, None]).astype(np.float32)
        sin_b = (-np.sin(angle) * wfull[:, None]).astype(np.float32)

    real = frames @ jnp.asarray(cos_b)
    imag = frames @ jnp.asarray(sin_b)
    return real * real + imag * imag


def whisper_log_mel(
    wav: jnp.ndarray,  # [B, 480000] (already padded/truncated to 30 s)
    num_mels: int = 128,
    n_fft: int = 400,
    hop_length: int = 160,
    sampling_rate: int = 16000,
) -> jnp.ndarray:
    """HF WhisperFeatureExtractor-parity log-mel: [B, num_mels, 3000]."""
    power = stft_power(wav, n_fft, hop_length)  # [B, 3001, 201]
    fb = jnp.asarray(
        mel_filter_bank_slaney(1 + n_fft // 2, num_mels, 0.0, 8000.0, sampling_rate)
    )
    mel = jnp.maximum(power @ fb, 1e-10)  # [B, F, M]
    log_spec = jnp.log10(mel)
    log_spec = log_spec[:, :-1, :]  # drop the final frame (HF [:, :-1])
    max_per_sample = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_per_sample - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.transpose(log_spec, (0, 2, 1))  # [B, M, F]


def hz_to_mel_htk(freq):
    return 2595.0 * np.log10(1.0 + np.asarray(freq, np.float64) / 700.0)


def mel_to_hz_htk(mels):
    return 700.0 * (10.0 ** (np.asarray(mels, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=4)
def _htk_mel_bank(num_bins: int, num_mels: int, fmin: float, fmax: float, sr: int):
    fft_freqs = np.linspace(0, sr / 2, num_bins)
    mel_pts = np.linspace(hz_to_mel_htk(fmin), hz_to_mel_htk(fmax), num_mels + 2)
    f_pts = mel_to_hz_htk(mel_pts)
    fdiff = np.diff(f_pts)
    slopes = f_pts[None, :] - fft_freqs[:, None]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    return np.maximum(0.0, np.minimum(down, up)).astype(np.float32)


def speechbrain_fbank(
    wav: jnp.ndarray,  # [B, L] @16 kHz
    num_mels: int = 24,
    n_fft: int = 400,
    hop_length: int = 160,
    sampling_rate: int = 16000,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """speechbrain ``Fbank`` + sentence-level mean norm, [B, F, num_mels].

    Math parity target: speechbrain.lobes.features.Fbank defaults as used by
    ``spkrec-xvect-voxceleb`` (reference bin/old/train_cat_baselinelike_xvector.py:177
    calls ``EncoderClassifier.encode_batch`` whose pipeline is Fbank(24 mel,
    25 ms/10 ms, HTK mel scale, 10·log10 with top_db=80) → per-sentence mean
    normalization). speechbrain itself is not installable in this image, so
    this is a documented re-implementation, unit-tested for shape/finiteness
    and masking behavior rather than golden outputs.
    """
    wav = wav.astype(jnp.float32)
    # speechbrain STFT: center=True (reflect), periodic hamming window
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    B, L = x.shape
    num_frames = 1 + (L - n_fft) // hop_length
    idx = np.arange(num_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = x[:, jnp.asarray(idx)]
    n = np.arange(n_fft)
    win = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / n_fft)  # periodic hamming
    k = np.arange(1 + n_fft // 2)
    angle = 2.0 * np.pi * np.outer(n, k) / n_fft
    cos_b = jnp.asarray((np.cos(angle) * win[:, None]).astype(np.float32))
    sin_b = jnp.asarray((-np.sin(angle) * win[:, None]).astype(np.float32))
    real = frames @ cos_b
    imag = frames @ sin_b
    power = real * real + imag * imag
    fb = jnp.asarray(_htk_mel_bank(1 + n_fft // 2, num_mels, 0.0, sampling_rate / 2, sampling_rate))
    mel = power @ fb
    log_mel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    # top_db clamp (per-sample)
    log_mel = jnp.maximum(log_mel, jnp.max(log_mel, axis=(1, 2), keepdims=True) - 80.0)
    # sentence-level mean normalization (InputNormalization std_norm=False)
    if lengths is not None:
        fl = 1 + (lengths.astype(jnp.int32)) // hop_length
        m = (jnp.arange(num_frames)[None, :] < fl[:, None]).astype(jnp.float32)[:, :, None]
        mean = jnp.sum(log_mel * m, axis=1, keepdims=True) / jnp.maximum(
            jnp.sum(m, axis=1, keepdims=True), 1.0
        )
    else:
        mean = jnp.mean(log_mel, axis=1, keepdims=True)
    return log_mel - mean
