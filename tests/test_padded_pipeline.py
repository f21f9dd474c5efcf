"""Round-5 M-machine correctness: the padded shared-program FRI/commit
pipeline (merkle.commit_evals_device + fri._fri_prove_padded) must emit
BYTE-IDENTICAL proofs to the host-orchestrated reference path, and the
numpy STARK helpers must match the jitted programs.

Runs on the CPU mesh at toy geometry by shrinking the module pad
constants (the production values are env-tunable for the same reason)."""

import numpy as np
import pytest

import jax

from eigen_zeth_tpu.models import fri, merkle, stark
from eigen_zeth_tpu.models.transcript import Transcript
from eigen_zeth_tpu.ops import goldilocks as gl
from eigen_zeth_tpu.ops import ntt as nttm
from eigen_zeth_tpu.ops.goldilocks import GF

SHIFT = gl.MULTIPLICATIVE_GENERATOR


# The padded DEVICE programs cannot be exercised on the CPU test mesh:
# XLA CPU's compile time explodes on Poseidon graphs in every flavor
# (nested-scan perms AND the unrolled body both measured minutes at TOY
# sizes, round 5) — the same pathology that made the old fused-FRI CPU
# tests 590 s+.  Device-path byte-equality is validated on the real TPU
# (bench.py FRI gate verifies the emitted proof; scripts/check_padded.py
# runs the full host-vs-padded equality there).  The CPU suite covers
# the numpy/C++ host halves of the pipeline, which share the protocol
# code with the device path.


def test_np_tree_matches_host_merkle():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, gl.P, size=(64, 2), dtype=np.uint64)
    t = fri._NpTree(vals)
    ref = merkle._commit_leaves_host(gl.from_int_np(vals))
    assert t.root() == ref.root()
    idx = [0, 3, 31, 63]
    rows, paths = t.open_with_rows(idx)
    assert paths == ref.open_many(idx)
    for q, j in enumerate(idx):
        assert [int(x) for x in rows[q]] == [int(x) for x in vals[j]]
        assert merkle.verify_path(t.root(), j, [int(x) for x in rows[q]], paths[q])


def test_np_fold_matches_device_fold():
    rng = np.random.default_rng(6)
    evals = gl.random_gf((1 << 8,), rng)
    beta = 987654321
    want = gl.to_int(fri.fold_layer(evals, beta, SHIFT))
    got = fri._np_fold(np.asarray(gl.to_int(evals), dtype=np.uint64), beta, SHIFT)
    assert np.array_equal(got, want)


def test_np_stark_helpers_match_device():
    n, blowup = 1 << 6, 4
    rng = np.random.default_rng(9)
    data = [int(x) for x in rng.integers(0, gl.P, size=n - 2, dtype=np.uint64)]
    d_col, a_col, out = stark.build_trace(data, iv=7, n=n)
    A_np, D_np = stark._np_trace_lde(d_col, a_col, n, blowup, SHIFT)
    dg = gl.from_int(np.array(d_col, dtype=np.uint64))
    ag = gl.from_int(np.array(a_col, dtype=np.uint64))
    D_lde, A_lde, rows, _buf = stark._lde_prog(n, blowup, SHIFT)(
        dg.lo, dg.hi, ag.lo, ag.hi
    )
    assert np.array_equal(A_np, gl.to_int(A_lde))
    assert np.array_equal(D_np, gl.to_int(D_lde))
    alphas = [123, 456, 789]
    comp_np = stark._np_composition(A_np, D_np, alphas, 7, out, n, blowup, SHIFT)
    al = gl.from_int(np.array(alphas, dtype=np.uint64))
    iv_s = gl.from_int(np.uint64(7))
    out_s = gl.from_int(np.uint64(out % gl.P))
    q1m, x1i, xwi = stark._comp_consts_dev(n, blowup, SHIFT)
    comp_dev = stark._comp_prog(n, blowup, SHIFT)(
        A_lde, D_lde, al, iv_s, out_s, q1m, x1i, xwi
    )
    assert np.array_equal(comp_np, gl.to_int(comp_dev))


def test_np_mode_chunk_proof_matches_and_verifies(monkeypatch):
    """Force the numpy chunk pipeline: byte-identical to the standard
    CPU path and verifier-accepted."""
    params = stark.StarkParams(blowup=4, num_queries=4, terminal_size=16)
    rng = np.random.default_rng(11)
    data = [int(x) for x in rng.integers(0, gl.P, size=30, dtype=np.uint64)]
    ref = stark.prove_chunk(data, iv=5, params=params, n_rows=64)
    monkeypatch.setenv("EZT_FORCE_NP_STARK", "1")
    got = stark.prove_chunk(data, iv=5, params=params, n_rows=64)
    assert got == ref
    assert stark.verify_chunk(got, params)


def test_np_fri_full_path_matches_host():
    """_fri_prove_padded with host-plane inputs (the numpy route the
    padded prover takes below NATIVE_MIN_LEAVES) must equal the
    reference host path byte for byte."""
    params = fri.FriParams(blowup=4, num_queries=5, terminal_size=16, arity=8)
    rng = np.random.default_rng(13)
    coeffs = gl.random_gf((1 << 8,), rng)
    evals = nttm.lde(coeffs, 4, SHIFT)
    t1, t2 = Transcript("nf"), Transcript("nf")
    host = fri.fri_prove(evals, SHIFT, t1, params, fused=False)
    dev = fri._fri_prove_padded(evals, SHIFT, t2, params)
    assert host.proof == dev.proof
    assert t1.export_state() == t2.export_state()
