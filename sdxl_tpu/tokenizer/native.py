"""ctypes binding for the native (C++) BPE merge core.

Builds native/libsdxl_bpe.so on first use if a toolchain is available;
falls back silently to the pure-Python merge loop otherwise. Parity between
the two paths is enforced by tests/test_native_bpe.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libsdxl_bpe.so")

_lib = None
_lib_failed = False


def _load_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.isfile(_SO_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.bpe_new.restype = ctypes.c_void_p
        lib.bpe_new.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        lib.bpe_apply.restype = ctypes.c_int64
        lib.bpe_apply.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


class NativeBpe:
    """Holds a native rank table; apply() mirrors Tokenizer.bpe()."""

    def __init__(self, merges: Sequence[Tuple[str, str]]):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native BPE unavailable")
        self._lib = lib
        blob = "\n".join(f"{a} {b}" for a, b in merges).encode("utf-8")
        self._handle = lib.bpe_new(blob, len(blob))
        self._buf = ctypes.create_string_buffer(1 << 16)

    def apply(self, token: str) -> str:
        data = token.encode("utf-8")
        n = self._lib.bpe_apply(
            self._handle, data, len(data), self._buf, len(self._buf)
        )
        if n < 0:
            raise ValueError("token too long for native BPE buffer")
        return self._buf.raw[:n].decode("utf-8")

    def __del__(self):
        lib = getattr(self, "_lib", None)
        handle = getattr(self, "_handle", None)
        if lib is not None and handle:
            lib.bpe_free(handle)


def try_native_bpe(merges) -> Optional[NativeBpe]:
    try:
        return NativeBpe(merges)
    except Exception:
        return None
