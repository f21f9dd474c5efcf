"""FRI prove/verify: honest round trip, tamper rejection, degree soundness."""

import copy

import pytest

import numpy as np

from eigen_zeth_tpu.models import fri
from eigen_zeth_tpu.models.transcript import Transcript
from eigen_zeth_tpu.ops import goldilocks as gl
from eigen_zeth_tpu.ops import ntt as nttm

RNG = np.random.default_rng(0xF21)

PARAMS = fri.FriParams(blowup=4, num_queries=4, terminal_size=32)
SHIFT = gl.MULTIPLICATIVE_GENERATOR


def _commit_poly(n):
    """Random degree-<n poly; return its blowup-coset evaluations."""
    coeffs = RNG.integers(0, gl.P, size=n, dtype=np.uint64)
    evals = nttm.lde(gl.from_int(coeffs), PARAMS.blowup, SHIFT)
    return coeffs, evals


def test_fri_roundtrip():
    coeffs, evals = _commit_poly(64)
    out = fri.fri_prove(evals, SHIFT, Transcript("fri"), PARAMS)
    ok, layer0 = fri.fri_verify(out.proof, Transcript("fri"), PARAMS)
    assert ok
    assert len(layer0) == PARAMS.num_queries
    # layer-0 openings must be the committed evaluations
    ev = gl.to_int(evals)
    m = len(ev)
    for jj, u, v in layer0:
        assert u == int(ev[jj])
        assert v == int(ev[jj + m // 2])


def test_fri_rejects_tampered_value():
    _, evals = _commit_poly(64)
    out = fri.fri_prove(evals, SHIFT, Transcript("fri"), PARAMS)
    bad = copy.deepcopy(out.proof)
    bad["queries"][0]["layers"][0]["u"] = str(
        (int(bad["queries"][0]["layers"][0]["u"]) + 1) % gl.P
    )
    ok, _ = fri.fri_verify(bad, Transcript("fri"), PARAMS)
    assert not ok


@pytest.mark.slow
def test_fri_rejects_tampered_root():
    _, evals = _commit_poly(64)
    out = fri.fri_prove(evals, SHIFT, Transcript("fri"), PARAMS)
    bad = copy.deepcopy(out.proof)
    bad["roots"][1][0] = str((int(bad["roots"][1][0]) ^ 1))
    ok, _ = fri.fri_verify(bad, Transcript("fri"), PARAMS)
    assert not ok


@pytest.mark.slow
def test_fri_rejects_tampered_final_coeffs():
    _, evals = _commit_poly(64)
    out = fri.fri_prove(evals, SHIFT, Transcript("fri"), PARAMS)
    bad = copy.deepcopy(out.proof)
    bad["final_coeffs"][0] = str((int(bad["final_coeffs"][0]) + 1) % gl.P)
    ok, _ = fri.fri_verify(bad, Transcript("fri"), PARAMS)
    assert not ok


def test_fri_rejects_high_degree():
    """Evaluations of a function of too-high degree must not verify.

    The prover's own terminal assert trips for an honest prover, so build
    the proof with a lenient blowup and verify against the strict one."""
    n = 64
    coeffs = RNG.integers(0, gl.P, size=n * PARAMS.blowup, dtype=np.uint64)
    # full-degree "polynomial" on the same domain size as _commit_poly(64)
    evals = nttm.ntt(nttm.coset_shift(gl.from_int(coeffs), SHIFT))
    lenient = fri.FriParams(
        blowup=1, num_queries=PARAMS.num_queries, terminal_size=PARAMS.terminal_size
    )
    out = fri.fri_prove(evals, SHIFT, Transcript("fri"), lenient)
    ok, _ = fri.fri_verify(out.proof, Transcript("fri"), PARAMS)
    assert not ok


def test_zero_layer_fri_roundtrip():
    """m <= terminal_size emits no fold layers; the verifier terminates
    directly against the final polynomial (small production chunks hit
    this with the default terminal_size=64)."""
    from eigen_zeth_tpu.models.transcript import Transcript

    params = fri.FriParams(blowup=4, num_queries=3, terminal_size=64)
    n = 16
    coeffs = RNG.integers(0, gl.P, size=n, dtype=np.uint64)
    evals = nttm.lde(gl.from_int(coeffs), params.blowup, SHIFT)
    out = fri.fri_prove(evals, SHIFT, Transcript("t"), params)
    assert out.proof["roots"] == []
    ok, layer0 = fri.fri_verify(out.proof, Transcript("t"), params)
    assert ok and len(layer0) == 3
    ev = gl.to_int(evals)
    for jj, u, v in layer0:
        assert u == int(ev[jj]) and v == int(ev[jj + (n * params.blowup) // 2])
    # tamper: bump a final coefficient
    bad = dict(out.proof)
    bad["final_coeffs"] = list(bad["final_coeffs"])
    bad["final_coeffs"][0] = str((int(bad["final_coeffs"][0]) + 1) % gl.P)
    ok2, _ = fri.fri_verify(bad, Transcript("t"), params)
    assert not ok2


@pytest.mark.slow  # fused XLA CPU compile is minutes even at toy sizes
def test_fused_prover_matches_host_prover():
    """models/fri_fused.py must produce byte-identical proofs to the
    host-orchestrated path and leave the transcript in the same state."""
    _, evals = _commit_poly(256)
    t_host, t_fused = Transcript("fri"), Transcript("fri")
    out_host = fri.fri_prove(evals, SHIFT, t_host, PARAMS, fused=False)
    out_fused = fri.fri_prove(evals, SHIFT, t_fused, PARAMS, fused=True)
    assert out_host.proof == out_fused.proof
    assert out_host.layer0_indices == out_fused.layer0_indices
    assert t_host.export_state() == t_fused.export_state()
    ok, _ = fri.fri_verify(out_fused.proof, Transcript("fri"), PARAMS)
    assert ok


@pytest.mark.slow
def test_fused_prover_mid_transcript():
    """Fused prove must splice correctly into a transcript with prior
    absorbs/challenges (the STARK passes a mid-state transcript)."""
    _, evals = _commit_poly(128)
    t1, t2 = Transcript("stark"), Transcript("stark")
    for t in (t1, t2):
        t.absorb("public", [5, 6, 7])
        t.challenges("alpha", 3)
    a = fri.fri_prove(evals, SHIFT, t1, PARAMS, fused=False)
    b = fri.fri_prove(evals, SHIFT, t2, PARAMS, fused=True)
    assert a.proof == b.proof
    assert t1.export_state() == t2.export_state()


# --- reduction arity > 2 (fri.FriParams.arity) ------------------------------

ARITY8 = fri.FriParams(blowup=4, num_queries=4, terminal_size=32, arity=8)


def test_arity8_roundtrip_and_layer_count():
    """Arity-8 reduction: log2(arity) binary folds per committed tree.
    At 2^12 with a 32-terminal the schedule is [2, 8, 8] (layer 0 always
    pairs so callers' (jj, u, v) layer-0 cross-checks keep their shape)."""
    _, evals = _commit_poly(1 << 10)  # domain 2^12
    out = fri.fri_prove(evals, SHIFT, Transcript("a8"), ARITY8, fused=False)
    assert len(out.proof["roots"]) == 3  # vs 7 at arity 2
    assert ARITY8.layer_schedule(1 << 12) == [2, 8, 8]
    ok, layer0 = fri.fri_verify(out.proof, Transcript("a8"), ARITY8)
    assert ok and len(layer0) == ARITY8.num_queries
    # layer-0 openings still pairwise
    q0 = out.proof["queries"][0]["layers"]
    assert set(q0[0].keys()) == {"u", "v", "path"}
    assert set(q0[1].keys()) == {"vals", "path"} and len(q0[1]["vals"]) == 8


def test_arity8_rejects_tampered_leaf_value():
    _, evals = _commit_poly(1 << 10)
    out = fri.fri_prove(evals, SHIFT, Transcript("a8"), ARITY8, fused=False)
    for li in (0, 1, 2):
        bad = copy.deepcopy(out.proof)
        layer = bad["queries"][0]["layers"][li]
        if "u" in layer:
            layer["u"] = str((int(layer["u"]) + 1) % gl.P)
        else:
            layer["vals"][3] = str((int(layer["vals"][3]) + 1) % gl.P)
        ok, _ = fri.fri_verify(bad, Transcript("a8"), ARITY8)
        assert not ok, f"accepted tampered layer {li}"


def test_arity8_rejects_wrong_arity_params():
    """A proof built at arity 8 must not verify under arity-2 params and
    vice versa (the layer schedule is bound through the transcript)."""
    _, evals = _commit_poly(1 << 10)
    p2 = fri.FriParams(blowup=4, num_queries=4, terminal_size=32, arity=2)
    out8 = fri.fri_prove(evals, SHIFT, Transcript("x"), ARITY8, fused=False)
    out2 = fri.fri_prove(evals, SHIFT, Transcript("x"), p2, fused=False)
    assert not fri.fri_verify(out8.proof, Transcript("x"), p2)[0]
    assert not fri.fri_verify(out2.proof, Transcript("x"), ARITY8)[0]


@pytest.mark.slow
def test_arity8_fused_matches_host():
    _, evals = _commit_poly(1 << 7)  # domain 2^9: schedule [2, 8] (XLA CPU
    # compile of fused programs is minutes-per-tree; keep this minimal)
    t1, t2 = Transcript("f8"), Transcript("f8")
    host = fri.fri_prove(evals, SHIFT, t1, ARITY8, fused=False)
    dev = fri.fri_prove(evals, SHIFT, t2, ARITY8, fused=True)
    assert host.proof == dev.proof
    assert t1.export_state() == t2.export_state()
    ok, _ = fri.fri_verify(dev.proof, Transcript("f8"), ARITY8)
    assert ok
