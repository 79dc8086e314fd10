"""Native (C++) components, loaded via ctypes with pure-Python fallback.

``load_bpe_core()`` compiles ``bpe_core.cpp`` once (g++ -O2 -shared) into
a cache dir and returns a ctypes handle factory, or None when no
toolchain is available / compilation fails / VIDSITU_NO_NATIVE=1 — the
callers (tokenization/bpe.py) then keep the pure-Python path. The two
implementations are asserted id-identical in tests/test_native_bpe.py.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import sys
import tempfile
from pathlib import Path
from typing import List, Optional

_SRC_DIR = Path(__file__).resolve().parent
_LOG = logging.getLogger(__name__)
_LIB = None
_LIB_FAILED = False


def _build_lib() -> Optional[Path]:
    src = _SRC_DIR / "bpe_core.cpp"
    cache = Path(
        os.environ.get(
            "VIDSITU_NATIVE_CACHE",
            Path(tempfile.gettempdir()) / "vidsitu_tpu_native",
        )
    )
    cache.mkdir(parents=True, exist_ok=True)
    lib = cache / f"libbpe_core_{sys.version_info[0]}.so"
    if lib.exists() and lib.stat().st_mtime >= src.stat().st_mtime:
        return lib
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        str(src), "-o", str(lib),
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=300
        )
    except (OSError, subprocess.TimeoutExpired) as e:
        _LOG.info("native bpe build unavailable: %s", e)
        return None
    if proc.returncode != 0:
        _LOG.warning("native bpe build failed:\n%s", proc.stderr[-2000:])
        return None
    return lib


def load_bpe_core():
    """Returns the loaded ctypes library or None."""
    global _LIB, _LIB_FAILED
    if os.environ.get("VIDSITU_NO_NATIVE") == "1":
        return None
    if _LIB is not None:
        return _LIB
    if _LIB_FAILED:
        return None
    lib_path = _build_lib()
    if lib_path is None:
        _LIB_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError as e:
        _LOG.warning("native bpe load failed: %s", e)
        _LIB_FAILED = True
        return None
    lib.bpe_create.restype = ctypes.c_void_p
    lib.bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.bpe_destroy.argtypes = [ctypes.c_void_p]
    lib.bpe_encode.restype = ctypes.c_int32
    lib.bpe_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    _LIB = lib
    return _LIB


class NativeBPE:
    """ctypes wrapper over the C++ byte-level BPE encode core."""

    def __init__(self, vocab: dict, merges: List[tuple]):
        lib = load_bpe_core()
        if lib is None:
            raise RuntimeError("native bpe core unavailable")
        self._lib = lib
        vocab_buf = "".join(
            f"{tok}\t{idx}\n" for tok, idx in vocab.items()
        ).encode("utf-8")
        merges_buf = "".join(f"{a} {b}\n" for a, b in merges).encode("utf-8")
        self._handle = lib.bpe_create(vocab_buf, merges_buf)
        if not self._handle:
            raise RuntimeError("bpe_create failed")

    def encode(self, text: str) -> List[int]:
        data = text.encode("utf-8")
        cap = max(64, 2 * len(data) + 16)
        while True:
            out = (ctypes.c_int32 * cap)()
            n = self._lib.bpe_encode(
                self._handle, data, len(data), out, cap
            )
            if n >= 0:
                return list(out[:n])
            cap *= 2

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.bpe_destroy(self._handle)
        except Exception:
            pass
