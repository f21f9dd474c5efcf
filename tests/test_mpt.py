"""Merkle-Patricia trie root — Ethereum's state/tx commitment
(replaces the round-1 flat keccak snapshot; reference analog: the state
root computation in src/custom_reth/mod.rs:714)."""

from eigen_zeth_tpu.ops import keccak
from eigen_zeth_tpu.utils import mpt, rlp

k = keccak.keccak256_host


def test_empty_root_constant():
    # keccak256(rlp(b'')) — the canonical Ethereum empty-trie root
    assert mpt.trie_root({}) == k(rlp.encode(b""))
    assert mpt.EMPTY_ROOT.hex().startswith("56e81f17")


def test_single_leaf_manual():
    key, val = b"\x12\x34", b"hello world value padded....x"
    # leaf node = rlp([hex-prefix(path, leaf), value]); root = keccak
    hp = bytes([0x20, 0x12, 0x34])
    assert mpt.trie_root({key: val}) == k(rlp.encode([hp, val]))


def test_extension_branch_manual():
    # keys 0x11 / 0x1f share nibble [1]: ext([1]) -> branch{1, f}
    va, vb = b"A" * 40, b"B" * 40
    leaf_a = rlp.encode([bytes([0x20]), va])
    leaf_b = rlp.encode([bytes([0x20]), vb])
    slots = [b""] * 17
    slots[1] = k(leaf_a)
    slots[0xF] = k(leaf_b)
    branch = rlp.encode(slots)
    ext = rlp.encode([bytes([0x11]), k(branch)])
    assert mpt.trie_root({b"\x11": va, b"\x1f": vb}) == k(ext)


def test_inline_small_nodes():
    # values small enough that child nodes embed inline (< 32 bytes RLP)
    items = {b"\x11": b"a", b"\x1f": b"b"}
    leaf_a = rlp.encode([bytes([0x20]), b"a"])  # 4 bytes -> inline
    leaf_b = rlp.encode([bytes([0x20]), b"b"])
    slots_payload = (
        rlp.encode(b"")  # slot 0
        + leaf_a  # slot 1: INLINE structure, not hash
        + rlp.encode(b"") * 13  # slots 2..e
        + leaf_b  # slot f
        + rlp.encode(b"")  # value slot
    )
    branch = rlp._len_prefix(len(slots_payload), 0xC0) + slots_payload
    ref = branch if len(branch) < 32 else k(branch)
    ext_payload = rlp.encode(bytes([0x11])) + (
        ref if len(branch) < 32 else rlp.encode(ref)
    )
    ext = rlp._len_prefix(len(ext_payload), 0xC0) + ext_payload
    assert mpt.trie_root(items) == k(ext)


def test_order_invariance_and_dispersion():
    items = {bytes([i, j]): bytes([i * 16 + j]) * 8 for i in range(4) for j in range(4)}
    r1 = mpt.trie_root(dict(items))
    r2 = mpt.trie_root(dict(reversed(list(items.items()))))
    assert r1 == r2
    items[b"\x00\x01"] = b"changed!"
    assert mpt.trie_root(items) != r1


def test_secure_and_index_roots():
    assert mpt.secure_root({}) == mpt.EMPTY_ROOT
    vals = [b"tx-%d" % i * 5 for i in range(20)]
    r = mpt.index_root(vals)
    assert r != mpt.index_root(vals[:-1])
    assert r != mpt.index_root(vals[:-1] + [b"tampered" * 4])
