"""AIR framework round-trip: a toy 2-column program with a periodic
selector (alternating Fibonacci / multiply rows), boundary constraints,
tamper rejection.  This is the framework the recursive verifier AIR
(models/recursion.py) is built on."""

import json

import numpy as np
import pytest

from eigen_zeth_tpu.models import air as air_m
from eigen_zeth_tpu.ops import goldilocks as gl


def _toy_air(n=64):
    # periodic selector, period 4: rows 0-2 fibonacci, row 3 multiply
    sel = np.array([1, 1, 1, 0], dtype=np.uint64)

    def c0(a, cur, nxt, per):
        s = per[0]
        fib = a.sub(nxt[0], cur[1])
        mul = a.sub(nxt[0], a.mul(cur[0], cur[1]))
        return a.add(a.mul(s, fib), a.sub(mul, a.mul(s, mul)))

    def c1(a, cur, nxt, per):
        s = per[0]
        fib = a.sub(nxt[1], a.add(cur[0], cur[1]))
        hold = a.sub(nxt[1], cur[1])
        return a.add(a.mul(s, fib), a.sub(hold, a.mul(s, hold)))

    return air_m.Air(
        n=n,
        n_cols=2,
        periodic=[sel],
        constraints=[
            air_m.Constraint("c0", c0),
            air_m.Constraint("c1", c1),
        ],
        name="toy-fib-mul",
    )


def _toy_trace(n, x0, x1):
    a = np.zeros(n, dtype=np.uint64)
    b = np.zeros(n, dtype=np.uint64)
    a[0], b[0] = x0, x1
    for r in range(n - 1):
        if r % 4 != 3:
            a[r + 1] = b[r]
            b[r + 1] = (int(a[r]) + int(b[r])) % gl.P
        else:
            a[r + 1] = int(a[r]) * int(b[r]) % gl.P
            b[r + 1] = b[r]
    return gl.from_int(np.stack([a, b], axis=1)), int(b[n - 1])


@pytest.fixture(scope="module")
def proof_bundle():
    n = 64
    air = _toy_air(n)
    trace, out = _toy_trace(n, 3, 5)
    publics = [3, 5, out]
    bnds = [
        air_m.Boundary(0, 0, 3),
        air_m.Boundary(1, 0, 5),
        air_m.Boundary(1, n - 1, out),
    ]
    proof = air_m.prove(air, trace, publics, bnds, num_queries=8)
    return air, proof, publics, bnds, out


def test_air_round_trip(proof_bundle):
    air, proof, publics, bnds, _ = proof_bundle
    assert air_m.verify(air, proof, publics, bnds)


def test_air_rejects_wrong_boundary(proof_bundle):
    air, proof, publics, bnds, out = proof_bundle
    bad = [air_m.Boundary(0, 0, 3), air_m.Boundary(1, 0, 5),
           air_m.Boundary(1, air.n - 1, (out + 1) % gl.P)]
    assert not air_m.verify(air, proof, publics, bad)


def test_air_rejects_tampered_opening(proof_bundle):
    air, proof, publics, bnds, _ = proof_bundle
    bad = json.loads(json.dumps(proof))
    row = bad["trace_openings"][0][0]["row"]
    row[0] = str((int(row[0]) + 1) % gl.P)
    assert not air_m.verify(air, bad, publics, bnds)


def test_air_rejects_tampered_root(proof_bundle):
    air, proof, publics, bnds, _ = proof_bundle
    bad = json.loads(json.dumps(proof))
    bad["trace_root"][0] = str((int(bad["trace_root"][0]) + 1) % gl.P)
    assert not air_m.verify(air, bad, publics, bnds)


def test_air_rejects_invalid_trace():
    # a trace violating the multiply row must fail at proving time
    # (composition is not low-degree -> FRI terminal degree assert)
    n = 64
    air = _toy_air(n)
    trace, out = _toy_trace(n, 3, 5)
    rows = gl.to_int(trace)
    rows[17, 0] = (int(rows[17, 0]) + 1) % gl.P
    bad_trace = gl.from_int(rows)
    bnds = [air_m.Boundary(0, 0, 3), air_m.Boundary(1, 0, 5)]
    with pytest.raises(AssertionError):
        air_m.prove(air, bad_trace, [3, 5], bnds, num_queries=8)


def test_np_prover_matches_device_prover():
    """Round-5 numpy AIR prover (zero XLA compiles — the CPU/node-scale
    default) must emit byte-identical proofs to the jitted device path."""
    import os

    from eigen_zeth_tpu.models import air as air_m

    n = 32
    air = _toy_air(n)
    trace, out = _toy_trace(n, 3, 5)
    publics = [3, 5, out]
    bnds = [
        air_m.Boundary(0, 0, 3),
        air_m.Boundary(1, 0, 5),
        air_m.Boundary(1, n - 1, out),
    ]
    p_np = air_m.prove(air, trace, publics, bnds, num_queries=2)
    os.environ["EZT_FORCE_DEV_AIR"] = "1"
    try:
        p_dev = air_m.prove(_toy_air(n), trace, publics, bnds, num_queries=2)
    finally:
        del os.environ["EZT_FORCE_DEV_AIR"]
    assert p_np == p_dev
    assert air_m.verify(air, p_np, publics, bnds)
