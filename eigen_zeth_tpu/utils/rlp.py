"""RLP encoding (encode-only) — for legacy-transaction batch packing.

Reference analog: the reth RLP wrappers in src/settlement/worker.rs:
477-554 (EIP-155 signing payload of a legacy tx).
"""

from __future__ import annotations


def encode_int(v: int) -> bytes:
    if v == 0:
        return b""
    return v.to_bytes((v.bit_length() + 7) // 8, "big")


def encode(item) -> bytes:
    """item: bytes | int | list (recursively)."""
    if isinstance(item, int):
        return encode(encode_int(item))
    if isinstance(item, (bytes, bytearray)):
        b = bytes(item)
        if len(b) == 1 and b[0] < 0x80:
            return b
        return _len_prefix(len(b), 0x80) + b
    if isinstance(item, (list, tuple)):
        payload = b"".join(encode(x) for x in item)
        return _len_prefix(len(payload), 0xC0) + payload
    raise TypeError(f"cannot RLP-encode {type(item)}")


def _len_prefix(length: int, offset: int) -> bytes:
    if length < 56:
        return bytes([offset + length])
    lb = encode_int(length)
    return bytes([offset + 55 + len(lb)]) + lb
