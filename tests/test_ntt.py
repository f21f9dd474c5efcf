"""NTT correctness: direct DFT reference, round-trips, four-step, poly ops.

Parity anchor: BASELINE config 1 — Goldilocks NTT 2^12 forward+inverse,
bit-exact against an independent (python bigint) reference.
"""

import numpy as np

from eigen_zeth_tpu.ops import goldilocks as gl
from eigen_zeth_tpu.ops import ntt as nttm

RNG = np.random.default_rng(0x17E0)


def direct_ntt(vals, inverse=False):
    """O(n^2) python-bigint DFT — the independent reference."""
    n = len(vals)
    w = gl.primitive_root_of_unity(n)
    if inverse:
        w = gl.h_inv(w)
    out = []
    for k in range(n):
        acc = 0
        wk = pow(w, k, gl.P)
        x = 1
        for j in range(n):
            acc = (acc + int(vals[j]) * x) % gl.P
            x = (x * wk) % gl.P
        if inverse:
            acc = (acc * gl.h_inv(n)) % gl.P
        out.append(acc)
    return out


def rand_ints(n):
    return RNG.integers(0, gl.P, size=n, dtype=np.uint64)


def test_ntt_matches_direct_dft():
    for n in [2, 4, 16, 64]:
        v = rand_ints(n)
        got = gl.to_int(nttm.ntt(gl.from_int(v)))
        np.testing.assert_array_equal(got, np.array(direct_ntt(v), dtype=np.uint64))


def test_intt_matches_direct_dft():
    for n in [4, 64]:
        v = rand_ints(n)
        got = gl.to_int(nttm.intt(gl.from_int(v)))
        np.testing.assert_array_equal(
            got, np.array(direct_ntt(v, inverse=True), dtype=np.uint64)
        )


def test_roundtrip_4096():
    # BASELINE config 1: 2^12 forward+inverse, bit-exact
    v = rand_ints(1 << 12)
    x = gl.from_int(v)
    back = gl.to_int(nttm.intt(nttm.ntt(x)))
    np.testing.assert_array_equal(back, v)


def test_batched_ntt():
    v = rand_ints(4 * 64).reshape(4, 64)
    got = gl.to_int(nttm.ntt(gl.from_int(v)))
    for i in range(4):
        np.testing.assert_array_equal(got[i], np.array(direct_ntt(v[i]), dtype=np.uint64))


def test_four_step_matches_flat():
    for n, rows in [(64, 8), (256, 4)]:
        v = rand_ints(n)
        x = gl.from_int(v)
        flat = gl.to_int(nttm.ntt(x))
        four = gl.to_int(nttm.ntt_four_step(x, nttm.make_four_step_plan(n, rows)))
        np.testing.assert_array_equal(four, flat)


def test_four_step_inverse():
    n, rows = 1 << 10, 32
    v = rand_ints(n)
    x = gl.from_int(v)
    fwd = nttm.ntt_four_step(x, nttm.make_four_step_plan(n, rows))
    back = nttm.intt_four_step(fwd, nttm.make_four_step_plan(n, rows, inverse=True))
    np.testing.assert_array_equal(gl.to_int(back), v)


def test_poly_mul():
    a = rand_ints(100)
    b = rand_ints(60)
    got = gl.to_int(nttm.poly_mul(gl.from_int(a), gl.from_int(b)))
    # schoolbook reference
    expect = [0] * 256
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            expect[i + j] = (expect[i + j] + int(ai) * int(bj)) % gl.P
    np.testing.assert_array_equal(got, np.array(expect, dtype=np.uint64))


def test_lde_evaluates_on_coset():
    n, blowup = 32, 4
    coeffs = rand_ints(n)
    evals = gl.to_int(nttm.lde(gl.from_int(coeffs), blowup))
    g = gl.MULTIPLICATIVE_GENERATOR
    w = gl.primitive_root_of_unity(n * blowup)
    for k in [0, 1, 7, n * blowup - 1]:
        x = gl.h_mul(g, pow(w, k, gl.P))  # g*w^k
        expect = 0
        for j in reversed(range(n)):
            expect = (expect * x + int(coeffs[j])) % gl.P
        assert int(evals[k]) == expect
