"""Fuzz tests: uint32 word primitives + Goldilocks field vs python bigints."""

import numpy as np
import jax.numpy as jnp

from eigen_zeth_tpu.ops import goldilocks as gl
from eigen_zeth_tpu.ops.u32 import mulhilo32, mul64, add64, sub64

RNG = np.random.default_rng(0xE16E)
N = 4096


def obj(seq):
    """List of python ints -> object ndarray (avoids float64 degradation)."""
    a = np.empty(len(seq), dtype=object)
    a[:] = [int(x) for x in seq]
    return a


def rand_u32(n=N):
    return jnp.asarray(RNG.integers(0, 1 << 32, size=n, dtype=np.uint32))


def rand_u64_pair(n=N):
    v = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    return (
        jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
        v,
    )


def test_mulhilo32():
    a, b = rand_u32(), rand_u32()
    lo, hi = mulhilo32(a, b)
    prod = np.asarray(a, dtype=np.uint64) * np.asarray(b, dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(lo), (prod & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(hi), (prod >> np.uint64(32)).astype(np.uint32))


def test_add64_sub64():
    alo, ahi, a = rand_u64_pair()
    blo, bhi, b = rand_u64_pair()
    lo, hi, c = add64(alo, ahi, blo, bhi)
    s = a.astype(object) + b.astype(object)
    got = np.asarray(lo, dtype=object) + (np.asarray(hi, dtype=object) << 32)
    np.testing.assert_array_equal(got, obj([x % (1 << 64) for x in s]))
    np.testing.assert_array_equal(np.asarray(c, dtype=object), obj([x >> 64 for x in s]))

    lo, hi, brw = sub64(alo, ahi, blo, bhi)
    d = a.astype(object) - b.astype(object)
    got = np.asarray(lo, dtype=object) + (np.asarray(hi, dtype=object) << 32)
    np.testing.assert_array_equal(got, obj([x % (1 << 64) for x in d]))
    np.testing.assert_array_equal(np.asarray(brw, dtype=object), obj([1 if x < 0 else 0 for x in d]))


def test_mul64():
    alo, ahi, a = rand_u64_pair()
    blo, bhi, b = rand_u64_pair()
    r = mul64(alo, ahi, blo, bhi)
    got = sum(np.asarray(w, dtype=object) << (32 * i) for i, w in enumerate(r))
    expect = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(got, obj(list(expect)))


def _rand_gf_ints(n=N):
    return RNG.integers(0, gl.P, size=n, dtype=np.uint64)


def test_roundtrip():
    v = _rand_gf_ints()
    np.testing.assert_array_equal(gl.to_int(gl.from_int(v)), v)


def test_add_sub_neg():
    a, b = _rand_gf_ints(), _rand_gf_ints()
    ga, gb = gl.from_int(a), gl.from_int(b)
    np.testing.assert_array_equal(
        gl.to_int(gl.add(ga, gb)).astype(object),
        obj([(int(x) + int(y)) % gl.P for x, y in zip(a, b)]),
    )
    np.testing.assert_array_equal(
        gl.to_int(gl.sub(ga, gb)).astype(object),
        obj([(int(x) - int(y)) % gl.P for x, y in zip(a, b)]),
    )
    np.testing.assert_array_equal(
        gl.to_int(gl.neg(ga)).astype(object), obj([(-int(x)) % gl.P for x in a])
    )


def test_add_edge_cases():
    edge = [0, 1, gl.P - 1, gl.P - 2, 0xFFFFFFFF, 0xFFFFFFFF00000000, 1 << 32, (1 << 32) - 1]
    vals = [(x, y) for x in edge for y in edge]
    a = np.array([x for x, _ in vals], dtype=np.uint64)
    b = np.array([y for _, y in vals], dtype=np.uint64)
    ga, gb = gl.from_int(a), gl.from_int(b)
    np.testing.assert_array_equal(
        gl.to_int(gl.add(ga, gb)).astype(object),
        obj([(int(x) + int(y)) % gl.P for x, y in vals]),
    )
    np.testing.assert_array_equal(
        gl.to_int(gl.mul(ga, gb)).astype(object),
        obj([(int(x) * int(y)) % gl.P for x, y in vals]),
    )


def test_mul():
    a, b = _rand_gf_ints(), _rand_gf_ints()
    got = gl.to_int(gl.mul(gl.from_int(a), gl.from_int(b)))
    expect = [(int(x) * int(y)) % gl.P for x, y in zip(a, b)]
    np.testing.assert_array_equal(got.astype(object), obj(expect))


def test_inv():
    a = _rand_gf_ints(256)
    a[0] = 1
    a[1] = gl.P - 1
    inv = gl.to_int(gl.inv(gl.from_int(a)))
    for x, ix in zip(a, inv):
        assert (int(x) * int(ix)) % gl.P == 1


def test_inv_zero_is_zero():
    assert gl.to_int(gl.inv(gl.zeros(()))) == 0


def test_pow_const():
    a = _rand_gf_ints(64)
    ga = gl.from_int(a)
    for e in [0, 1, 2, 3, 7, 65537, gl.P - 2]:
        got = gl.to_int(gl.pow_const(ga, e))
        expect = [pow(int(x), e, gl.P) for x in a]
        np.testing.assert_array_equal(got.astype(object), obj(expect))


def test_roots_of_unity():
    for order in [2, 4, 1 << 10, 1 << 20]:
        w = gl.primitive_root_of_unity(order)
        assert pow(w, order, gl.P) == 1
        assert pow(w, order // 2, gl.P) == gl.P - 1  # primitive


def test_np_mulmod_fuzz():
    """Vectorized numpy field mul == python bigint mul, incl. edge values
    (the trace-safe twiddle builder behind every NTT plan)."""
    rng = np.random.default_rng(0x60D)
    a = rng.integers(0, gl.P, size=4096, dtype=np.uint64)
    b = rng.integers(0, gl.P, size=4096, dtype=np.uint64)
    edge = np.array(
        [0, 1, 2, gl.P - 1, gl.P - 2, (1 << 32) - 1, 1 << 32, (1 << 63)],
        dtype=np.uint64,
    )
    a[: len(edge)] = edge
    b[: len(edge)] = edge[::-1]
    got = gl.np_mulmod(a, b)
    for x, y, g in zip(a.tolist(), b.tolist(), got.tolist()):
        assert g == (x * y) % gl.P, (x, y)


def test_powers_np_matches_pow():
    w = gl.primitive_root_of_unity(1 << 12)
    got = gl.powers_np(w, 1 << 12)
    assert got[0] == 1 and got[1] == w
    idx = [2, 3, 100, 4095]
    for i in idx:
        assert int(got[i]) == pow(w, i, gl.P)


def test_powers_device_matches_np():
    w = gl.primitive_root_of_unity(1 << 10)
    dev = gl.to_int(gl.powers(w, 1000))
    np.testing.assert_array_equal(dev, gl.powers_np(w, 1000))


def test_batch_inv_matches_inv():
    a = _rand_gf_ints(256)
    a[a == 0] = 1
    got = gl.to_int(gl.batch_inv(gl.from_int(a)))
    for x, ix in zip(a.tolist(), got.tolist()):
        assert (x * ix) % gl.P == 1
