"""Full Ethereum precompile set 0x01-0x09 in the L2 EVM (the revm
precompile-registry role inside the reference's payload builder,
src/custom_reth/mod.rs:604-613).  Known-answer vectors: EIP-152 blake2f
official test vector, EIP-198 modexp example, BN254 2G coordinates, and
a bilinearity pairing check driven through EIP-197 calldata encoding."""

import hashlib

from eigen_zeth_tpu.ops import bn254
from eigen_zeth_tpu.sequencer.evm import EVM, BlockCtx, WorldState

SENDER = "0x" + "11" * 20


def _pre(n):
    return "0x" + "00" * 19 + f"{n:02x}"


def _evm():
    return EVM(WorldState(), BlockCtx(number=1, timestamp=1000))


def _call(evm, n, data, gas=10_000_000):
    return evm._call(SENDER, _pre(n), 0, data, gas, 0)


# 2*G1 on BN254 (public curve constant)
TWO_G = (
    1368015179489954701390400359078579693043519447331113978918064868415326638035,
    9918110051302171585080402603319702774565515993150576347155970296011118125764,
)
# BN254 G2 generator, (re, im) per coordinate (public curve constant)
G2_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)


def _g1_bytes(p):
    if p is None:
        return bytes(64)
    return p[0].to_bytes(32, "big") + p[1].to_bytes(32, "big")


def _g2_bytes(x, y):
    # EIP-197 Fq2 encoding: imaginary word first
    return (x[1].to_bytes(32, "big") + x[0].to_bytes(32, "big")
            + y[1].to_bytes(32, "big") + y[0].to_bytes(32, "big"))


def test_ripemd160():
    evm = _evm()
    out, _ = _call(evm, 3, b"abc")
    assert out == bytes(12) + hashlib.new("ripemd160", b"abc").digest()
    assert len(out) == 32


def test_modexp_eip198_vectors():
    evm = _evm()
    # 3^(2^256 - 2^32 - 978) mod (2^256 - 2^32 - 977) == 1 (EIP-198 example)
    m = (1 << 256) - (1 << 32) - 977
    data = (
        (1).to_bytes(32, "big") + (32).to_bytes(32, "big") + (32).to_bytes(32, "big")
        + b"\x03" + (m - 1).to_bytes(32, "big") + m.to_bytes(32, "big")
    )
    out, _ = _call(evm, 5, data)
    assert int.from_bytes(out, "big") == 1 and len(out) == 32
    # tiny sanity: 3^5 mod 7 = 5, 1-byte modulus -> 1-byte output
    data = (
        (1).to_bytes(32, "big") + (1).to_bytes(32, "big") + (1).to_bytes(32, "big")
        + bytes([3, 5, 7])
    )
    out, _ = _call(evm, 5, data)
    assert out == bytes([5])


def test_bn254_ecadd_ecmul():
    evm = _evm()
    g = bn254.G1_GEN
    out, _ = _call(evm, 6, _g1_bytes(g) + _g1_bytes(g))
    assert out == _g1_bytes(TWO_G)
    # P + inf = P
    out, _ = _call(evm, 6, _g1_bytes(g) + bytes(64))
    assert out == _g1_bytes(g)
    # 2*G via ecmul
    out, _ = _call(evm, 7, _g1_bytes(g) + (2).to_bytes(32, "big"))
    assert out == _g1_bytes(TWO_G)
    # k*G matches the host ladder for a big scalar
    k = 0x1234_5678_9ABC_DEF0_1111
    out, _ = _call(evm, 7, _g1_bytes(g) + k.to_bytes(32, "big"))
    assert out == _g1_bytes(bn254.h_ec_mul(k, g))
    # off-curve point -> the call fails (caller sees push-0); here _Halt
    import pytest
    from eigen_zeth_tpu.sequencer.evm import _Halt

    bad = (1).to_bytes(32, "big") + (1).to_bytes(32, "big")
    with pytest.raises(_Halt):
        _call(evm, 6, bad + _g1_bytes(g))


def test_bn254_pairing_check():
    evm = _evm()
    g = bn254.G1_GEN
    neg_g = (g[0], bn254.Q - g[1])
    # e(G, H) * e(-G, H) == 1
    data = (_g1_bytes(g) + _g2_bytes(G2_X, G2_Y)
            + _g1_bytes(neg_g) + _g2_bytes(G2_X, G2_Y))
    out, _ = _call(evm, 8, data)
    assert int.from_bytes(out, "big") == 1
    # e(G, H) * e(G, H) != 1
    data = (_g1_bytes(g) + _g2_bytes(G2_X, G2_Y)) * 2
    out, _ = _call(evm, 8, data)
    assert int.from_bytes(out, "big") == 0
    # bilinearity: e(aG, H) * e(-G, aH) == 1  (a in G1 vs a in G2)
    a = 7
    ag = bn254.h_ec_mul(a, g)
    ah = bn254.h_ec_mul_jac_f(a, (G2_X, G2_Y), bn254.HOST_FQ2)
    data = (_g1_bytes(ag) + _g2_bytes(G2_X, G2_Y)
            + _g1_bytes(neg_g) + _g2_bytes(ah[0], ah[1]))
    out, _ = _call(evm, 8, data)
    assert int.from_bytes(out, "big") == 1
    # empty input is a valid product over zero pairs -> 1
    out, _ = _call(evm, 8, b"")
    assert int.from_bytes(out, "big") == 1


def test_blake2f_eip152_vector():
    evm = _evm()
    # EIP-152 test vector 5 (12 rounds, the blake2b F known-answer)
    data = bytes.fromhex(
        "0000000c"
        "48c9bdf267e6096a3ba7ca8485ae67bb2bf894fe72f36e3cf1361d5f3af54fa5"
        "d182e6ad7f520e511f6c3e2b8c68059b6bbd41fbabd9831f79217e1319cde05b"
        "6162630000000000000000000000000000000000000000000000000000000000"
        "0000000000000000000000000000000000000000000000000000000000000000"
        "0000000000000000000000000000000000000000000000000000000000000000"
        "0000000000000000000000000000000000000000000000000000000000000000"
        "0300000000000000"
        "0000000000000000"
        "01"
    )
    out, _ = _call(evm, 9, data)
    assert out.hex() == (
        "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1"
        "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923"
    )
    # this equals blake2b-512("abc")
    assert out == hashlib.blake2b(b"abc").digest()
    # malformed length halts
    import pytest
    from eigen_zeth_tpu.sequencer.evm import _Halt

    with pytest.raises(_Halt):
        _call(evm, 9, data[:-1])


def test_precompile_gas_is_charged():
    evm = _evm()
    # sha256 of 1 word costs 72; give exactly that
    out, rem = _call(evm, 2, b"x" * 32, gas=72)
    assert out == hashlib.sha256(b"x" * 32).digest() and rem == 0
    import pytest
    from eigen_zeth_tpu.sequencer.evm import _Halt

    with pytest.raises(_Halt):
        _call(evm, 2, b"x" * 32, gas=71)
