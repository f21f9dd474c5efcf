"""Poseidon host/device bit-equality, Merkle commit/open/verify, transcript.

Device-perm calls run under jax.disable_jit(): XLA CPU compile time on
Poseidon graphs is minutes even at toy sizes (round-5 measurement — this
was the dominant cost of the round-4 suite on a fresh checkout), while
op-by-op interpretation covers the same traced code in seconds."""

import jax
import numpy as np

from eigen_zeth_tpu.ops import goldilocks as gl
from eigen_zeth_tpu.ops import poseidon
from eigen_zeth_tpu.models import merkle
from eigen_zeth_tpu.models.transcript import Transcript

RNG = np.random.default_rng(0x505E)


def rand_ints(*shape):
    return RNG.integers(0, gl.P, size=shape, dtype=np.uint64)


def test_perm_host_device_bitexact():
    states = rand_ints(4, poseidon.WIDTH)
    with jax.disable_jit():
        got = gl.to_int(poseidon.perm(gl.from_int(states)))
    for i in range(4):
        expect = poseidon.perm_host([int(v) for v in states[i]])
        np.testing.assert_array_equal(got[i], np.array(expect, dtype=np.uint64))


def test_perm_changes_zero_state():
    out = poseidon.perm_host([0] * poseidon.WIDTH)
    assert out != [0] * poseidon.WIDTH
    assert len(set(out)) == poseidon.WIDTH  # no trivially repeated lanes


def test_hash_elements_host_device_bitexact():
    for k in [1, 8, 9]:
        vals = rand_ints(3, k)
        with jax.disable_jit():
            got = gl.to_int(poseidon.hash_elements(gl.from_int(vals)))
        for i in range(3):
            expect = poseidon.hash_elements_host([int(v) for v in vals[i]])
            np.testing.assert_array_equal(got[i], np.array(expect, dtype=np.uint64))


def test_hash_elements_length_domain_separation():
    # [x] and [x, 0] must hash differently (length is absorbed)
    a = poseidon.hash_elements_host([5])
    b = poseidon.hash_elements_host([5, 0])
    assert a != b


def test_hash_two_host_device_bitexact():
    l = rand_ints(3, 4)
    r = rand_ints(3, 4)
    with jax.disable_jit():
        got = gl.to_int(poseidon.hash_two(gl.from_int(l), gl.from_int(r)))
    for i in range(3):
        expect = poseidon.hash_two_host([int(v) for v in l[i]], [int(v) for v in r[i]])
        np.testing.assert_array_equal(got[i], np.array(expect, dtype=np.uint64))


def test_merkle_commit_open_verify():
    n, k = 32, 6
    leaves_np = rand_ints(n, k)
    leaves = gl.from_int(leaves_np)
    tree = merkle.commit_leaves(leaves)
    root = tree.root()
    for idx in [0, 1, 31]:
        path = tree.open(idx)
        assert merkle.verify_path(root, idx, [int(v) for v in leaves_np[idx]], path)
        # tampered leaf must fail
        bad = [int(v) + 1 for v in leaves_np[idx]]
        assert not merkle.verify_path(root, idx, bad, path)
    # tampered path must fail
    path = tree.open(5)
    path[2][0] ^= 1
    assert not merkle.verify_path(root, 5, [int(v) for v in leaves_np[5]], path)


def test_merkle_device_scan_matches_host():
    """The accelerator-side commit path (now the C++ native engine for
    generic row shapes) must produce the same tree as the numpy path."""
    leaves = gl.from_int(rand_ints(32, 4))
    td = merkle.commit_leaves(leaves, prefer_host=False)
    th = merkle.commit_leaves(leaves, prefer_host=True)
    assert td.root() == th.root()
    assert td.open(5) == th.open(5)
    assert len(td.levels) == len(th.levels)


def test_merkle_root_deterministic():
    leaves = gl.from_int(rand_ints(16, 4))
    assert merkle.commit_leaves(leaves).root() == merkle.commit_leaves(leaves).root()


def test_transcript_determinism_and_sensitivity():
    def run(absorb_val):
        t = Transcript("test")
        t.absorb("root", [absorb_val, 2, 3])
        c1 = t.challenge("alpha")
        t.absorb("layer", [c1])
        return t.challenges("beta", 3)

    assert run(1) == run(1)
    assert run(1) != run(2)

    # label sensitivity
    t1 = Transcript("test")
    t1.absorb("a", [7])
    t2 = Transcript("test")
    t2.absorb("b", [7])
    assert t1.challenge("c") != t2.challenge("c")


def test_transcript_indices_in_range():
    t = Transcript("idx")
    t.absorb("seed", [42])
    idxs = t.challenge_indices("q", 20, 1 << 10)
    assert len(idxs) == 20
    assert all(0 <= i < (1 << 10) for i in idxs)
    assert len(set(idxs)) > 5  # not degenerate


def test_perm_unrolled_and_np_bitexact():
    """The unrolled device body, the vectorized numpy perm, and the C++
    native engine all match perm_host."""
    states = rand_ints(4, poseidon.WIDTH)
    with jax.disable_jit():
        got_u = gl.to_int(poseidon.perm(gl.from_int(states), unroll=True))
    got_np = poseidon.np_perm(states)
    for i in range(4):
        expect = poseidon.perm_host([int(v) for v in states[i]])
        np.testing.assert_array_equal(got_u[i], np.array(expect, dtype=np.uint64))
        np.testing.assert_array_equal(got_np[i], np.array(expect, dtype=np.uint64))


def test_native_engine_bitexact():
    from eigen_zeth_tpu.native import poseidon2 as nps

    if not nps.available():  # pragma: no cover - toolchain always present here
        import pytest

        pytest.skip("native toolchain unavailable")
    states = rand_ints(3, poseidon.WIDTH)
    got = nps.perm_batch(states.copy())
    for i in range(3):
        expect = poseidon.perm_host([int(v) for v in states[i]])
        assert [int(v) for v in got[i]] == expect
    rows = rand_ints(5, 7)
    he = nps.hash_elements(rows)
    for i in range(5):
        assert [int(v) for v in he[i]] == poseidon.hash_elements_host(
            [int(v) for v in rows[i]]
        )
    d = rand_ints(16, 4)
    lv = nps.tree(d)
    cur = d
    for level in lv:
        want = poseidon.np_hash_two(cur[0::2], cur[1::2])
        np.testing.assert_array_equal(level, want)
        cur = want
