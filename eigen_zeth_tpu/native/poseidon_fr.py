"""ctypes binding for the native Poseidon2-Fr engine (poseidon_fr.cpp).

Parameters come from ops/poseidon_fr.py (single source of truth) with
round constants / diagonal pre-converted to Montgomery form here at load
time.  API works on (…, 4)-uint64 limb arrays in REGULAR form.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "poseidon_fr.cpp")
_SO = os.path.join(_DIR, "libposeidonfr.so")

_build_lock = threading.Lock()
_lib = None


def _build() -> str:
    with _build_lock:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return _SO
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", "-pthread", _SRC, "-o", _SO,
            ],
            check=True,
            capture_output=True,
        )
        return _SO


def _limbs(v: int) -> list[int]:
    return [(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)]


def to_limbs(vals) -> np.ndarray:
    """[int] -> (n, 4) uint64 regular-form limbs."""
    out = np.zeros((len(vals), 4), dtype=np.uint64)
    for i, v in enumerate(vals):
        out[i] = _limbs(int(v))
    return out


def from_limbs(arr: np.ndarray) -> list[int]:
    arr = np.asarray(arr, dtype=np.uint64)
    return [
        sum(int(arr[i, j]) << (64 * j) for j in range(4))
        for i in range(arr.shape[0])
    ]


def load() -> ctypes.CDLL | None:
    global _lib
    if _lib is None:
        try:
            lib = ctypes.CDLL(_build())
        except Exception:
            return None
        from ..ops import poseidon_fr as pfr

        u64p = np.ctypeslib.ndpointer(dtype=np.uint64, flags="C_CONTIGUOUS")
        lib.pfr_init.argtypes = [u64p, ctypes.c_uint64, u64p, u64p, u64p]
        lib.pfr_perm_batch.argtypes = [u64p, ctypes.c_uint64]
        lib.pfr_hash_two.argtypes = [u64p, u64p, u64p, ctypes.c_uint64, u64p]
        lib.pfr_hash_rows.argtypes = [
            u64p, ctypes.c_uint64, ctypes.c_uint64, u64p, u64p,
        ]
        lib.pfr_tree.argtypes = [u64p, ctypes.c_uint64, u64p, u64p]
        lib.pfr_grind.restype = ctypes.c_uint64
        lib.pfr_grind.argtypes = [
            u64p, ctypes.c_uint64, u64p, u64p,
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
        ]
        lib.pfr_ready.restype = ctypes.c_int

        R = pfr.R
        n0inv = (-pow(R, -1, 1 << 64)) % (1 << 64)
        r2 = pow(2, 512, R)
        mont = lambda v: (int(v) << 256) % R  # noqa: E731
        rc = np.zeros((pfr.N_ROUNDS, pfr.WIDTH, 4), dtype=np.uint64)
        for r_i, row in enumerate(pfr.round_constants()):
            for j, v in enumerate(row):
                rc[r_i, j] = _limbs(mont(v))
        mu = np.zeros((pfr.WIDTH, 4), dtype=np.uint64)
        for i, v in enumerate(pfr.internal_diag()):
            mu[i] = _limbs(mont(v))
        lib.pfr_init(
            np.asarray(_limbs(R), dtype=np.uint64),
            n0inv,
            np.asarray(_limbs(r2), dtype=np.uint64),
            np.ascontiguousarray(rc.reshape(-1)),
            np.ascontiguousarray(mu.reshape(-1)),
        )
        _lib = lib
    return _lib


def available() -> bool:
    try:
        return load() is not None
    except Exception:
        return False


def perm_batch(states: np.ndarray) -> np.ndarray:
    """(n, 12, 4) regular limbs, permuted in place."""
    lib = load()
    s = np.ascontiguousarray(states, dtype=np.uint64)
    lib.pfr_perm_batch(s, s.shape[0])
    return s


def hash_two(left: np.ndarray, right: np.ndarray, cap: int) -> np.ndarray:
    lib = load()
    left = np.ascontiguousarray(left, dtype=np.uint64)
    right = np.ascontiguousarray(right, dtype=np.uint64)
    n = left.shape[0]
    out = np.empty((n, 4), dtype=np.uint64)
    lib.pfr_hash_two(
        left, right, np.asarray(_limbs(cap), dtype=np.uint64), n, out
    )
    return out


def hash_rows(rows: np.ndarray, cap: int) -> np.ndarray:
    """(n, k, 4) regular limbs + capacity value -> (n, 4) digests."""
    lib = load()
    rows = np.ascontiguousarray(rows, dtype=np.uint64)
    n, k = rows.shape[0], rows.shape[1]
    out = np.empty((n, 4), dtype=np.uint64)
    lib.pfr_hash_rows(rows, n, k, np.asarray(_limbs(cap), dtype=np.uint64), out)
    return out


def tree(digests: np.ndarray, cap: int) -> list[np.ndarray]:
    """(n, 4) leaf digests -> interior levels bottom-up."""
    lib = load()
    digests = np.ascontiguousarray(digests, dtype=np.uint64)
    n = digests.shape[0]
    if n == 1:
        return []
    out = np.empty((n - 1, 4), dtype=np.uint64)
    lib.pfr_tree(digests, n, np.asarray(_limbs(cap), dtype=np.uint64), out)
    levels = []
    off, width = 0, n // 2
    while width >= 1:
        levels.append(out[off : off + width])
        off += width
        width //= 2
    return levels


def grind(state: list[int], pos: int, absorb_tag: int, chal_tag: int,
          bits: int, start: int = 0, count: int = 1 << 62) -> int | None:
    """Parallel nonce search mirroring TranscriptFr.grind's framing."""
    lib = load()
    st = np.zeros((12, 4), dtype=np.uint64)
    for j, v in enumerate(state):
        st[j] = _limbs(int(v))
    got = lib.pfr_grind(
        np.ascontiguousarray(st.reshape(-1)), pos,
        np.asarray(_limbs(absorb_tag), dtype=np.uint64),
        np.asarray(_limbs(chal_tag), dtype=np.uint64),
        bits, start, count,
    )
    return None if got == (1 << 64) - 1 else int(got)
