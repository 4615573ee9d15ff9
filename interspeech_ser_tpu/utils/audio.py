"""Host-side audio decode + resample (librosa-free).

The reference decodes with ``librosa.load(wav, sr=16000)``
(reference: preprocessing/preprocess_speech.py:47). This image has no
librosa/soundfile; PCM WAV decode goes through the stdlib ``wave`` module
(int16/int24/int32/float32 payloads) and resampling through
``scipy.signal.resample_poly`` (librosa's 'kaiser_best' equivalent class of
polyphase filters; MSP-Podcast audio is already 16 kHz so this path is
normally a no-op).
"""

from __future__ import annotations

import wave
from typing import Tuple

import numpy as np


def load_wav(path: str, target_sr: int = 16000) -> Tuple[np.ndarray, int]:
    """Decode a PCM WAV to mono float32 in [-1, 1] at ``target_sr``.

    Uses the native C++ loader (native/ser_audio.cpp, built via
    ``make -C native``) when present; this python path is the fallback
    and the parity reference. ``SER_TPU_NATIVE=0`` forces python.
    """
    from . import native_audio

    if native_audio.available():
        res = native_audio.load_wav_native(path, target_sr)
        if res is not None:
            return res[0], target_sr

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())

    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = (
            (b[:, 0].astype(np.int32))
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = (x - ((x & 0x800000) << 1)).astype(np.float32) / 8388608.0
    else:
        raise ValueError(f"{path}: unsupported sample width {width}")

    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)

    if sr != target_sr:
        from math import gcd

        from scipy.signal import resample_poly

        g = gcd(sr, target_sr)
        x = resample_poly(x, target_sr // g, sr // g).astype(np.float32)
        sr = target_sr
    return x, sr


def normalize_waveform(x: np.ndarray, do_normalize: bool = True) -> np.ndarray:
    """HF Wav2Vec2FeatureExtractor zero-mean/unit-variance normalization."""
    if not do_normalize:
        return x.astype(np.float32)
    return ((x - x.mean()) / np.sqrt(x.var() + 1e-7)).astype(np.float32)
