"""ctypes bindings for the native runtime components (runtime/*.cpp).

The C++ pieces mirror the reference's native layer (Mongoose server,
OpenSSL base64 — SURVEY.md §2.2) and are optional: everything has a pure-
Python fallback; ``build_native()`` compiles them on demand with make/g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))


def build_native(quiet: bool = True) -> bool:
    """Compile the native components; returns True on success."""
    try:
        r = subprocess.run(
            ["make", "-C", _DIR, "all"],
            capture_output=quiet, timeout=120,
        )
        return r.returncode == 0
    except Exception:
        return False


def native_server_binary() -> str | None:
    p = os.path.join(_DIR, "bin", "artifact_server")
    return p if os.path.exists(p) else None


class NativeSerde:
    """Base64 codec backed by libserde.so (fallback: stdlib base64)."""

    def __init__(self):
        self._lib = None
        so = os.path.join(_DIR, "lib", "libserde.so")
        if os.path.exists(so):
            try:
                lib = ctypes.CDLL(so)
                lib.b64_encode.restype = ctypes.c_size_t
                lib.b64_encode.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
                lib.b64_decode.restype = ctypes.c_size_t
                lib.b64_decode.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
                self._lib = lib
            except OSError:
                self._lib = None

    @property
    def is_native(self) -> bool:
        return self._lib is not None

    def encode(self, data: bytes) -> str:
        if self._lib is None:
            import base64

            return base64.b64encode(data).decode()
        out = ctypes.create_string_buffer(4 * ((len(data) + 2) // 3) + 1)
        n = self._lib.b64_encode(data, len(data), out)
        return out.raw[:n].decode()

    def decode(self, s: str) -> bytes:
        if self._lib is None:
            import base64

            return base64.b64decode(s)
        raw = s.encode()
        out = ctypes.create_string_buffer(3 * ((len(raw) + 3) // 4) + 1)
        n = self._lib.b64_decode(raw, len(raw), out)
        if n == ctypes.c_size_t(-1).value:
            raise ValueError("malformed base64")
        return out.raw[:n]
