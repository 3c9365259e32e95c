"""ctypes bindings for the native turboio library (native/turboio.cpp).

Native host-side runtime pieces (GGUF index parsing, O(n log n) SPM
encode) with graceful pure-Python fallback: every entry point returns
None / raises ImportError when the shared library is unavailable, and
callers fall back to the Python implementations.

The library is built lazily with `make -C native` on first use (g++ is
in the image); set TURBOINFER_NO_NATIVE=1 to force the Python paths.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import threading
from typing import List, Optional, Sequence

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libturboio.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("TURBOINFER_NO_NATIVE") == "1":
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib

        def _stale() -> bool:
            # A prebuilt .so from an older checkout lacks newer symbols
            # (dlopen caches by path in-process, so this must be decided
            # BEFORE the first CDLL). Rebuild whenever any source is
            # newer than the library.
            if not os.path.exists(_LIB_PATH):
                return True
            so_m = os.path.getmtime(_LIB_PATH)
            for f in ("turboio.cpp", "ggml_dequant.cpp", "Makefile"):
                p = os.path.join(_NATIVE_DIR, f)
                if os.path.exists(p) and os.path.getmtime(p) > so_m:
                    return True
            return False

        if _stale():
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR, "-s", "-B"],
                               check=True, capture_output=True, timeout=120)
            except (OSError, subprocess.SubprocessError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        if not hasattr(lib, "turboio_ggml_dequant"):
            # Stale binary that mtimes couldn't catch (e.g. clock skew):
            # fall back to the pure-Python paths rather than raising
            # AttributeError out of every loader call.
            _build_failed = True
            return None
        lib.turboio_gguf_index_json.restype = ctypes.c_void_p
        lib.turboio_gguf_index_json.argtypes = [ctypes.c_char_p]
        lib.turboio_free.argtypes = [ctypes.c_void_p]
        lib.turboio_version.restype = ctypes.c_char_p
        lib.turboio_spm_new.restype = ctypes.c_void_p
        lib.turboio_spm_new.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32]
        lib.turboio_spm_delete.argtypes = [ctypes.c_void_p]
        lib.turboio_spm_encode.restype = ctypes.c_int32
        lib.turboio_spm_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.turboio_ggml_dequant.restype = ctypes.c_int32
        lib.turboio_ggml_dequant.argtypes = [
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def version() -> Optional[str]:
    lib = _load()
    return lib.turboio_version().decode() if lib else None


def gguf_index(path: str) -> Optional[dict]:
    """Parse GGUF header/metadata/tensor-index natively -> dict, or None."""
    lib = _load()
    if lib is None:
        return None
    ptr = lib.turboio_gguf_index_json(path.encode())
    if not ptr:
        return None
    try:
        raw = ctypes.string_at(ptr)
        return json.loads(raw.decode("utf-8", errors="replace"))
    finally:
        lib.turboio_free(ptr)


def ggml_dequant(raw, ggml_type: int, n_elems: int):
    """Multithreaded native GGUF block dequantization
    (native/ggml_dequant.cpp) -> flat fp32 numpy array, or None when
    the library or the block type is unavailable (caller falls back to
    the numpy golden forms in loader/gguf.py)."""
    lib = _load()
    if lib is None:
        return None
    import numpy as np
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty(n_elems, np.float32)
    rc = lib.turboio_ggml_dequant(
        int(ggml_type), raw.ctypes.data_as(ctypes.c_void_p),
        raw.size, int(n_elems), out.ctypes.data_as(ctypes.c_void_p))
    return out if rc == 0 else None


class NativeSPMEncoder:
    """Native agenda-merge SPM encoder (same semantics as
    tokenizer/bpe.SPMTokenizer.encode)."""

    def __init__(self, tokens: Sequence[str], scores: Sequence[float],
                 add_space_prefix: bool = True):
        lib = _load()
        if lib is None:
            raise ImportError("turboio native library unavailable")
        self._lib = lib
        n = len(tokens)
        arr = (ctypes.c_char_p * n)(
            *[t.encode("utf-8") for t in tokens])
        sc = (ctypes.c_float * n)(*[float(s) for s in scores]) \
            if scores else None
        self._h = lib.turboio_spm_new(
            arr, sc, n, 1 if add_space_prefix else 0)

    def encode(self, text: str, add_bos: bool = False, bos_id: int = 1,
               unk_id: int = 0) -> List[int]:
        data = text.encode("utf-8")
        cap = 4 * len(data) + 8
        out = (ctypes.c_int32 * cap)()
        n = self._lib.turboio_spm_encode(
            self._h, data, 1 if add_bos else 0, bos_id, unk_id, out, cap)
        return list(out[:min(n, cap)])

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.turboio_spm_delete(self._h)
        except Exception:
            pass
