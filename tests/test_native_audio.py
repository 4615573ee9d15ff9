"""Native C++ audio loader: parity vs the python path, batch loading."""

import os
import subprocess
import sys
import wave as wave_mod

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _ensure_built():
    so = os.path.join(ROOT, "native", "libser_audio.so")
    if not os.path.exists(so):
        r = subprocess.run(["make", "-C", os.path.join(ROOT, "native")], capture_output=True)
        if r.returncode != 0 or not os.path.exists(so):
            pytest.skip("native toolchain unavailable")
    # an earlier test may have probed before the build and cached a negative
    from interspeech_ser_tpu.utils import native_audio

    native_audio.reset_cache()
    return so


def _write_wav(path, samples, sr=16000, width=2, channels=1):
    x = np.clip(np.asarray(samples), -1, 1)
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(sr)
        if width == 2:
            data = (x * 32767).astype("<i2")
        elif width == 4:
            data = (x * 2147483647).astype("<i4")
        if channels == 2:
            data = np.repeat(data[:, None], 2, axis=1).reshape(-1)
        w.writeframes(data.tobytes())


class TestNativeLoader:
    def test_matches_python_path_16k(self, tmp_path):
        _ensure_built()
        from interspeech_ser_tpu.utils import native_audio
        from interspeech_ser_tpu.utils.audio import load_wav

        assert native_audio.available()
        rng = np.random.default_rng(0)
        p = str(tmp_path / "a.wav")
        _write_wav(p, rng.normal(size=8000) * 0.2)
        nat, _ = native_audio.load_wav_native(p, 16000)
        os.environ["SER_TPU_NATIVE"] = "0"
        try:
            native_audio._TRIED = False
            native_audio._LIB = None
            py, _ = load_wav(p)
        finally:
            del os.environ["SER_TPU_NATIVE"]
            native_audio._TRIED = False
        np.testing.assert_allclose(nat, py, atol=1e-6)

    def test_resample_and_stereo(self, tmp_path):
        _ensure_built()
        from interspeech_ser_tpu.utils import native_audio

        t = np.arange(22050) / 22050
        tone = 0.5 * np.sin(2 * np.pi * 440 * t)
        p = str(tmp_path / "b.wav")
        _write_wav(p, tone, sr=22050, channels=2)
        out, sr_orig = native_audio.load_wav_native(p, 16000)
        assert sr_orig == 22050
        assert abs(len(out) - 16000) <= 2
        # 440 Hz tone survives: dominant FFT bin ±2 of expected
        spec = np.abs(np.fft.rfft(out[:16000]))
        assert abs(int(np.argmax(spec[10:])) + 10 - 440) <= 2

    def test_batch_loader(self, tmp_path):
        _ensure_built()
        from interspeech_ser_tpu.utils import native_audio

        rng = np.random.default_rng(1)
        paths = []
        for i in range(6):
            p = str(tmp_path / f"c{i}.wav")
            _write_wav(p, rng.normal(size=4000 + 100 * i) * 0.2)
            paths.append(p)
        paths.append(str(tmp_path / "missing.wav"))
        res = native_audio.load_batch_native(paths, num_threads=4)
        assert res is not None
        assert res[-1] is None  # missing file → None
        for i in range(6):
            assert res[i] is not None and len(res[i]) == 4000 + 100 * i
