"""ctypes binding for the native audio data-loader (native/ser_audio.cpp).

The C++ library handles WAV decode + windowed-sinc resample + normalization
with a std::thread batch loader, replacing the python/stdlib path of
``utils/audio.py`` when built (``make -C native``). Disable with
``SER_TPU_NATIVE=0``; the pure-python path is the always-available
fallback and the parity reference.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (
        os.path.join(here, "..", "..", "native", "libser_audio.so"),
        os.path.join(here, "libser_audio.so"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SER_TPU_NATIVE") == "0":
        return None
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.ser_audio_load.restype = ctypes.c_long
        lib.ser_audio_load.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ser_audio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.ser_audio_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_long),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def reset_cache() -> None:
    """Drop the cached probe (e.g. after building the .so post-import)."""
    global _LIB, _TRIED
    _LIB = None
    _TRIED = False


def available() -> bool:
    return get_lib() is not None


def load_wav_native(path: str, target_sr: int = 16000, normalize: bool = False):
    """→ (samples float32 [-1,1], original_sr) or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int(0)
    n = lib.ser_audio_load(
        path.encode(), target_sr, int(normalize), ctypes.byref(out), ctypes.byref(sr)
    )
    if n < 0:
        return None
    arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.ser_audio_free(out)
    return arr, int(sr.value)


def load_batch_native(
    paths: Sequence[str],
    target_sr: int = 16000,
    normalize: bool = False,
    num_threads: int = 8,
) -> Optional[List[Optional[np.ndarray]]]:
    """Threaded batch load; per-file None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_float) * n)()
    lengths = (ctypes.c_long * n)()
    lib.ser_audio_load_batch(
        c_paths, n, target_sr, int(normalize), num_threads, outs, lengths
    )
    result: List[Optional[np.ndarray]] = []
    for i in range(n):
        if lengths[i] < 0:
            result.append(None)
            continue
        arr = np.ctypeslib.as_array(outs[i], shape=(lengths[i],)).copy()
        lib.ser_audio_free(outs[i])
        result.append(arr)
    return result
