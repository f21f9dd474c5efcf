"""Keccak-256 known-answer vectors + host/device equality."""

import numpy as np

from eigen_zeth_tpu.ops import keccak

# Published Ethereum keccak256 vectors
KAT = {
    b"": "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470",
    b"abc": "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45",
}


def test_known_answer_host():
    for msg, digest in KAT.items():
        assert keccak.keccak256_host(msg).hex() == digest


def test_known_answer_device():
    for msg, digest in KAT.items():
        arr = np.frombuffer(msg, dtype=np.uint8).reshape(1, -1)
        assert keccak.keccak256(arr)[0].tobytes().hex() == digest


def test_host_device_equality_batch():
    rng = np.random.default_rng(7)
    for length in [1, 55, 135, 136, 137, 300]:
        msgs = rng.integers(0, 256, size=(5, length), dtype=np.uint8)
        got = keccak.keccak256(msgs)
        for i in range(5):
            assert got[i].tobytes() == keccak.keccak256_host(msgs[i].tobytes())


def test_multi_block_host():
    msg = bytes(range(256)) * 3  # 768 bytes -> 6 blocks
    # self-consistency: permutation-level host path equals byte-level device
    arr = np.frombuffer(msg, dtype=np.uint8).reshape(1, -1)
    assert keccak.keccak256(arr)[0].tobytes() == keccak.keccak256_host(msg)
