"""Keccak-256 — Ethereum-compatible hashing, vectorized for the VPU.

The zkEVM pipeline hashes batch data / transactions with Keccak (the
reference leans on keccak inside revm/reth-primitives for tx execution and
sealing, src/custom_reth/mod.rs:604-640, and BASELINE.json calls for
in-kernel Keccak vectorization for transcript hashing).  TPUs have no
64-bit integer lanes, so each of the 25 Keccak lanes is a (lo, hi) uint32
pair — rotations become paired shift/or, theta/chi are plain XOR/AND/NOT —
all elementwise VPU ops vectorized over a batch of messages.

Padding is Keccak-original (0x01 … 0x80), NOT SHA-3 (0x06): this matches
Ethereum's keccak256.

Host reference implementation included (pure python) as the test oracle;
known-answer vectors in tests pin keccak256(b"") etc. to the published
Ethereum values.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

RATE_BYTES = 136  # keccak256: rate 1088 bits, capacity 512
ROUNDS = 24

# Round constants (64-bit), standard Keccak values.
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# Rotation offsets r[x][y] (standard table, indexed [x + 5*y]).
_ROT = [
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14,
]

_PI_DEST = [0] * 25  # pi: B[y, 2x+3y] = A[x, y]; dest index for each src
for _x in range(5):
    for _y in range(5):
        _PI_DEST[_x + 5 * _y] = _y + 5 * ((2 * _x + 3 * _y) % 5)


# ---------------------------------------------------------------------------
# host reference (python ints)


def _rotl64(v: int, r: int) -> int:
    return ((v << r) | (v >> (64 - r))) & 0xFFFFFFFFFFFFFFFF


def keccak_f_host(lanes: list[int]) -> list[int]:
    a = list(lanes)
    for rnd in range(ROUNDS):
        # theta
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl64(c[(x + 1) % 5], 1) for x in range(5)]
        a = [a[i] ^ d[i % 5] for i in range(25)]
        # rho + pi
        b = [0] * 25
        for i in range(25):
            b[_PI_DEST[i]] = _rotl64(a[i], _ROT[i])
        # chi
        a = [
            b[i] ^ ((~b[(i % 5 + 1) % 5 + 5 * (i // 5)]) & b[(i % 5 + 2) % 5 + 5 * (i // 5)])
            & 0xFFFFFFFFFFFFFFFF
            for i in range(25)
        ]
        # iota
        a[0] ^= _RC[rnd]
    return a


def _pad(data: bytes) -> bytes:
    pad_len = RATE_BYTES - (len(data) % RATE_BYTES)
    padded = bytearray(data) + bytearray(pad_len)
    padded[len(data)] ^= 0x01
    padded[-1] ^= 0x80
    return bytes(padded)


def keccak256_host(data: bytes) -> bytes:
    lanes = [0] * 25
    padded = _pad(data)
    for off in range(0, len(padded), RATE_BYTES):
        block = padded[off : off + RATE_BYTES]
        for i in range(RATE_BYTES // 8):
            lanes[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
        lanes = keccak_f_host(lanes)
    out = b"".join(lanes[i].to_bytes(8, "little") for i in range(4))
    return out


# ---------------------------------------------------------------------------
# device (JAX) implementation — batch of states, lanes as uint32 pairs


def _rot_pair(lo, hi, r: int):
    """Rotate-left a 64-bit (lo, hi) uint32 pair by constant r."""
    r %= 64
    if r == 0:
        return lo, hi
    if r >= 32:
        lo, hi = hi, lo
        r -= 32
        if r == 0:
            return lo, hi
    s = 32 - r
    new_lo = (lo << r) | (hi >> s)
    new_hi = (hi << r) | (lo >> s)
    return new_lo, new_hi


def keccak_f(lo: jnp.ndarray, hi: jnp.ndarray):
    """Keccak-f[1600] on a batch: lo/hi shape (25, ...) uint32."""
    a_lo = [lo[i] for i in range(25)]
    a_hi = [hi[i] for i in range(25)]
    for rnd in range(ROUNDS):
        c_lo = [a_lo[x] ^ a_lo[x + 5] ^ a_lo[x + 10] ^ a_lo[x + 15] ^ a_lo[x + 20] for x in range(5)]
        c_hi = [a_hi[x] ^ a_hi[x + 5] ^ a_hi[x + 10] ^ a_hi[x + 15] ^ a_hi[x + 20] for x in range(5)]
        d = []
        for x in range(5):
            rl, rh = _rot_pair(c_lo[(x + 1) % 5], c_hi[(x + 1) % 5], 1)
            d.append((c_lo[(x - 1) % 5] ^ rl, c_hi[(x - 1) % 5] ^ rh))
        a_lo = [a_lo[i] ^ d[i % 5][0] for i in range(25)]
        a_hi = [a_hi[i] ^ d[i % 5][1] for i in range(25)]
        b_lo = [None] * 25
        b_hi = [None] * 25
        for i in range(25):
            rl, rh = _rot_pair(a_lo[i], a_hi[i], _ROT[i])
            b_lo[_PI_DEST[i]] = rl
            b_hi[_PI_DEST[i]] = rh
        for i in range(25):
            row = 5 * (i // 5)
            i1 = (i % 5 + 1) % 5 + row
            i2 = (i % 5 + 2) % 5 + row
            a_lo[i] = b_lo[i] ^ (~b_lo[i1] & b_lo[i2])
            a_hi[i] = b_hi[i] ^ (~b_hi[i1] & b_hi[i2])
        a_lo[0] = a_lo[0] ^ jnp.uint32(_RC[rnd] & 0xFFFFFFFF)
        a_hi[0] = a_hi[0] ^ jnp.uint32(_RC[rnd] >> 32)
    return jnp.stack(a_lo), jnp.stack(a_hi)


def keccak256(messages: np.ndarray) -> np.ndarray:
    """Batch keccak256: (N, L) uint8 same-length messages -> (N, 32) uint8.

    Padding/packing happens host-side (numpy); the 24-round permutation per
    block runs vectorized on device."""
    messages = np.asarray(messages, dtype=np.uint8)
    if messages.ndim == 1:
        messages = messages[None]
    n, length = messages.shape
    pad_len = RATE_BYTES - (length % RATE_BYTES)
    padded = np.zeros((n, length + pad_len), dtype=np.uint8)
    padded[:, :length] = messages
    padded[:, length] ^= 0x01
    padded[:, -1] ^= 0x80
    nblocks = padded.shape[1] // RATE_BYTES
    # (n, nblocks, 17 lanes, 8 bytes) -> little-endian uint32 pairs
    blocks = padded.reshape(n, nblocks, RATE_BYTES // 8, 8)
    lane_lo = (
        blocks[..., 0].astype(np.uint32)
        | (blocks[..., 1].astype(np.uint32) << 8)
        | (blocks[..., 2].astype(np.uint32) << 16)
        | (blocks[..., 3].astype(np.uint32) << 24)
    )
    lane_hi = (
        blocks[..., 4].astype(np.uint32)
        | (blocks[..., 5].astype(np.uint32) << 8)
        | (blocks[..., 6].astype(np.uint32) << 16)
        | (blocks[..., 7].astype(np.uint32) << 24)
    )
    lo = jnp.zeros((25, n), dtype=jnp.uint32)
    hi = jnp.zeros((25, n), dtype=jnp.uint32)
    for blk in range(nblocks):
        blo = jnp.asarray(lane_lo[:, blk].T)  # (17, n)
        bhi = jnp.asarray(lane_hi[:, blk].T)
        lo = lo.at[:17].set(lo[:17] ^ blo)
        hi = hi.at[:17].set(hi[:17] ^ bhi)
        lo, hi = keccak_f(lo, hi)
    out_lo = np.asarray(lo[:4]).T  # (n, 4)
    out_hi = np.asarray(hi[:4]).T
    out = np.zeros((n, 32), dtype=np.uint8)
    for i in range(4):
        out[:, 8 * i + 0] = out_lo[:, i] & 0xFF
        out[:, 8 * i + 1] = (out_lo[:, i] >> 8) & 0xFF
        out[:, 8 * i + 2] = (out_lo[:, i] >> 16) & 0xFF
        out[:, 8 * i + 3] = (out_lo[:, i] >> 24) & 0xFF
        out[:, 8 * i + 4] = out_hi[:, i] & 0xFF
        out[:, 8 * i + 5] = (out_hi[:, i] >> 8) & 0xFF
        out[:, 8 * i + 6] = (out_hi[:, i] >> 16) & 0xFF
        out[:, 8 * i + 7] = (out_hi[:, i] >> 24) & 0xFF
    return out
