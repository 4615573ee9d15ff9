"""Torch-format ``.pt`` tensor I/O (host-side only).

The reference's inter-stage contract is per-utterance ``.pt`` files
(reference: preprocessing/preprocess_speech.py:69-71 write;
bin/train_cat_bimodal_lazy_1head.py:227-228 read). We keep that contract
bit-compatible so cached embeddings interoperate both ways. torch (CPU wheel)
is used strictly as a host-side serialization library — it never touches the
compute path. A pure-python reader is provided as a fallback for hosts
without torch (torch's zip container + little-endian storage layout).
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from typing import Any, Dict

import numpy as np

try:
    import torch

    _HAS_TORCH = True
except Exception:  # pragma: no cover - torch is present in this image
    _HAS_TORCH = False


def save_tensor(array, path: str) -> None:
    """Save a single array as a torch-loadable ``.pt`` file (float32 etc.).

    Atomic (tmp + rename): a crash mid-write never leaves a truncated
    ``.pt`` behind, so SER_TPU_SKIP_EXISTING resumes can trust any file
    that exists."""
    arr = np.asarray(array)
    if _HAS_TORCH:
        tmp = f"{path}.tmp.{os.getpid()}"
        torch.save(torch.from_numpy(np.ascontiguousarray(arr)), tmp)
        os.replace(tmp, path)
    else:  # pragma: no cover
        raise NotImplementedError("pure-python .pt writer requires torch")


def load_tensor(path: str) -> np.ndarray:
    """Load a ``.pt`` file holding a single tensor → numpy array."""
    if _HAS_TORCH:
        t = torch.load(path, map_location="cpu", weights_only=True)
        return t.detach().numpy()
    return _load_pt_no_torch(path)  # pragma: no cover


def save_state_dict(tree: Dict[str, Any], path: str) -> None:
    """Save a flat ``{name: array}`` dict as a torch state_dict ``.pt``."""
    if _HAS_TORCH:
        sd = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)).copy()) for k, v in tree.items()}
        torch.save(sd, path)
    else:  # pragma: no cover
        raise NotImplementedError("pure-python .pt writer requires torch")


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch state_dict ``.pt`` → flat ``{name: numpy array}`` dict."""
    if _HAS_TORCH:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        return {k: v.detach().numpy() for k, v in sd.items()}
    return _load_pt_no_torch(path)  # pragma: no cover


# ---------------------------------------------------------------------------
# Pure-python torch-zipfile reader (fallback; covers the modern zip format)
# ---------------------------------------------------------------------------

_DTYPE_MAP = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # no native numpy bf16; upcast below
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _Storage:
    def __init__(self, dtype_name: str, key: str, numel: int):
        self.dtype_name = dtype_name
        self.key = key
        self.numel = numel
        self.data: bytes = b""


class _TensorStub:
    def __init__(self, storage: _Storage, offset, shape, stride):
        self.storage = storage
        self.offset = offset
        self.shape = shape
        self.stride = stride

    def to_numpy(self) -> np.ndarray:
        np_dtype = _DTYPE_MAP[self.storage.dtype_name]
        if np_dtype is None:  # bfloat16 → float32 upcast
            raw = np.frombuffer(self.storage.data, dtype=np.uint16)
            arr32 = raw.astype(np.uint32) << 16
            flat = arr32.view(np.float32)
        else:
            flat = np.frombuffer(self.storage.data, dtype=np_dtype)
        itemsize = flat.itemsize
        return np.lib.stride_tricks.as_strided(
            flat[self.offset :],
            shape=tuple(self.shape),
            strides=tuple(s * itemsize for s in self.stride),
        ).copy()


class _PtUnpickler(pickle.Unpickler):
    def __init__(self, f, zf: zipfile.ZipFile, prefix: str):
        super().__init__(f)
        self._zf = zf
        self._prefix = prefix

    def persistent_load(self, pid):
        typename, storage_type, key, _location, numel = pid[0], pid[1], pid[2], pid[3], pid[4]
        assert typename == "storage"
        name = getattr(storage_type, "__name__", str(storage_type))
        if name == "TypedStorage" or name.endswith("UntypedStorage"):
            name = str(storage_type)
        st = _Storage(name, key, numel)
        st.data = self._zf.read(f"{self._prefix}/data/{key}")
        return st

    def find_class(self, module, name):
        if name in _DTYPE_MAP:
            return type(name, (), {"__name__": name})
        if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
            def _rebuild(storage, offset, shape, stride, *_args):
                return _TensorStub(storage, offset, shape, stride)

            return _rebuild
        if (module, name) == ("collections", "OrderedDict"):
            import collections

            return collections.OrderedDict
        if module == "torch" and name.endswith("dtype"):
            return type("dtype", (), {})
        raise pickle.UnpicklingError(f"unsupported global in .pt: {module}.{name}")


def _load_pt_no_torch(path: str):
    """Read a torch-zip ``.pt`` without torch: single tensor or state dict."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl")]
        if not pkl:
            raise ValueError(f"{path}: not a torch zipfile checkpoint")
        prefix = pkl[0].rsplit("/", 1)[0]
        with zf.open(pkl[0]) as f:
            obj = _PtUnpickler(io.BytesIO(f.read()), zf, prefix).load()

    def _cvt(x):
        if isinstance(x, _TensorStub):
            return x.to_numpy()
        if isinstance(x, dict):
            return {k: _cvt(v) for k, v in x.items()}
        return x

    return _cvt(obj)
