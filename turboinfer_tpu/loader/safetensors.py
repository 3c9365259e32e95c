"""SafeTensors reader/writer.

Reference counterpart: the SafeTensors branch of ModelLoader
(reference: src/model/model_loader.cpp:346-547 — a hand-rolled JSON
state machine). Here the header is parsed with a real JSON parser and
all common dtypes load without coercion (the reference coerces
F16/I8/U8/BOOL to other types, model_loader.cpp:330-339), with the same
strict size validation (model_loader.cpp:928-934).
"""

from __future__ import annotations

import json
import mmap
import struct
from typing import Any, Dict, Optional, Tuple

import numpy as np

_DTYPES: Dict[str, Any] = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
    # BF16 has no numpy dtype: stored as uint16 and widened on read.
    "BF16": np.uint16,
}
_NP_TO_ST = {np.dtype(np.float64): "F64", np.dtype(np.float32): "F32",
             np.dtype(np.float16): "F16", np.dtype(np.int64): "I64",
             np.dtype(np.int32): "I32", np.dtype(np.int16): "I16",
             np.dtype(np.int8): "I8", np.dtype(np.uint8): "U8",
             np.dtype(np.bool_): "BOOL"}
try:
    # the framework's default param dtype — without this the writer
    # rejected bf16 while the reader happily parses BF16 (callers had
    # to upcast to f32 at 2x the file size)
    import ml_dtypes as _mld
    _NP_TO_ST[np.dtype(_mld.bfloat16)] = "BF16"
except ImportError:                                # pragma: no cover
    pass


class SafeTensorsFile:
    """mmap-backed lazy reader."""

    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "rb")
        self._mm = mmap.mmap(self._fh.fileno(), 0, access=mmap.ACCESS_READ)
        (header_len,) = struct.unpack("<Q", self._mm[:8])
        if header_len > len(self._mm) - 8:
            raise ValueError("safetensors header length exceeds file size")
        header = json.loads(self._mm[8:8 + header_len].decode("utf-8"))
        self.metadata: Dict[str, str] = header.pop("__metadata__", {})
        self.entries: Dict[str, dict] = header
        self._data_start = 8 + header_len
        data_len = len(self._mm) - self._data_start
        for name, ent in self.entries.items():
            dt = ent["dtype"]
            if dt not in _DTYPES:
                raise ValueError(f"unsupported safetensors dtype {dt}")
            begin, end = ent["data_offsets"]
            n = int(np.prod(ent["shape"])) if ent["shape"] else 1
            expect = n * np.dtype(_DTYPES[dt]).itemsize
            if end - begin != expect:
                raise ValueError(
                    f"tensor '{name}': offsets span {end - begin} bytes, "
                    f"expected {expect}")
            if end > data_len:
                raise ValueError(f"tensor '{name}' extends past end of file")

    def keys(self):
        return self.entries.keys()

    def tensor(self, name: str, dtype=None) -> np.ndarray:
        ent = self.entries[name]
        begin, end = ent["data_offsets"]
        np_dt = _DTYPES[ent["dtype"]]
        arr = np.frombuffer(self._mm, np_dt,
                            count=(end - begin) // np.dtype(np_dt).itemsize,
                            offset=self._data_start + begin)
        arr = arr.reshape(ent["shape"])
        if ent["dtype"] == "BF16":
            arr = (arr.astype(np.uint32) << 16).view(np.float32)
        if dtype is not None:
            arr = arr.astype(dtype, copy=False)
        return arr

    def close(self):
        try:
            self._mm.close()
        except BufferError:
            # zero-copy views handed out by tensor() are still alive
            # (e.g. an f32 tensor stored as-is in the params pytree);
            # the mapping is released when the last view is GC'd.
            pass
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_safetensors(path: str) -> SafeTensorsFile:
    return SafeTensorsFile(path)


def write_safetensors(path: str, tensors: Dict[str, np.ndarray],
                      metadata: Optional[Dict[str, str]] = None) -> None:
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = {k: str(v) for k, v in metadata.items()}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        st_dtype = _NP_TO_ST.get(arr.dtype)
        if st_dtype is None:
            raise ValueError(f"cannot write dtype {arr.dtype} to safetensors")
        header[name] = {"dtype": st_dtype, "shape": list(arr.shape),
                        "data_offsets": [offset, offset + arr.nbytes]}
        offset += arr.nbytes
        blobs.append(arr)
    hbytes = json.dumps(header).encode("utf-8")
    pad = (8 - len(hbytes) % 8) % 8          # align data start
    hbytes += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hbytes)))
        f.write(hbytes)
        for arr in blobs:
            f.write(arr.tobytes())
