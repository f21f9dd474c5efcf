"""ctypes binding for the native zethdb engine (zethdb.cpp).

Builds the shared library on first use with g++ (cached next to the
source); NativeDb then implements the same Database trait as the python
backends, over the identical on-disk log format — FileDb and NativeDb
can open each other's files.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

from ..protocol.kv import Database

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "zethdb.cpp")
_SO = os.path.join(_DIR, "libzethdb.so")

_build_lock = threading.Lock()
_lib = None


def _build() -> str:
    with _build_lock:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return _SO
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return _SO


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.zethdb_open.restype = ctypes.c_void_p
        lib.zethdb_open.argtypes = [ctypes.c_char_p]
        lib.zethdb_put.restype = ctypes.c_int
        lib.zethdb_put.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
            ctypes.c_char_p, ctypes.c_uint32,
        ]
        lib.zethdb_get.restype = ctypes.c_int
        lib.zethdb_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.zethdb_del.restype = ctypes.c_int
        lib.zethdb_del.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32]
        lib.zethdb_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.zethdb_close.argtypes = [ctypes.c_void_p]
        lib.zethdb_count.restype = ctypes.c_uint64
        lib.zethdb_count.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativeDb(Database):
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._lib = load()
        self._h = self._lib.zethdb_open(path.encode())
        if not self._h:
            raise OSError(f"zethdb_open failed for {path}")

    def get(self, key: bytes) -> Optional[bytes]:
        out = ctypes.POINTER(ctypes.c_uint8)()
        out_len = ctypes.c_uint32()
        rc = self._lib.zethdb_get(
            self._h, bytes(key), len(key), ctypes.byref(out), ctypes.byref(out_len)
        )
        if rc != 1:
            return None
        try:
            return ctypes.string_at(out, out_len.value)
        finally:
            self._lib.zethdb_free(out)

    def put(self, key: bytes, value: bytes) -> None:
        rc = self._lib.zethdb_put(self._h, bytes(key), len(key), bytes(value), len(value))
        if rc != 0:
            raise OSError("zethdb_put failed")

    def delete(self, key: bytes) -> Optional[bytes]:
        old = self.get(key)
        if old is not None:
            self._lib.zethdb_del(self._h, bytes(key), len(key))
        return old

    def count(self) -> int:
        return int(self._lib.zethdb_count(self._h))

    def close(self):
        if self._h:
            self._lib.zethdb_close(self._h)
            self._h = None
