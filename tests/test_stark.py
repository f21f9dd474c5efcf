"""Chunk STARK: prove/verify round trip + tamper rejection."""

import copy

import numpy as np
import pytest

from eigen_zeth_tpu.models import stark
from eigen_zeth_tpu.models.poseidon_tags import chunk_gamma
from eigen_zeth_tpu.ops import goldilocks as gl

RNG = np.random.default_rng(0x57A2)

PARAMS = stark.StarkParams(blowup=4, num_queries=4, terminal_size=16)


def test_build_trace_semantics():
    data = [5, 7, 11]
    d, a, out = stark.build_trace(data, iv=3)
    g = chunk_gamma()
    acc = 3
    for x in d[:-1]:
        acc = (acc * g + x) % gl.P
    assert out == acc
    assert len(d) == 4 and len(a) == 4


def test_prove_verify_roundtrip():
    data = [int(x) for x in RNG.integers(0, gl.P, size=13, dtype=np.uint64)]
    proof = stark.prove_chunk(data, iv=1, params=PARAMS)
    assert stark.verify_chunk(proof, PARAMS)


def test_reject_wrong_public_output():
    data = [1, 2, 3, 4]
    proof = stark.prove_chunk(data, iv=1, params=PARAMS)
    bad = copy.deepcopy(proof)
    bad["public"]["out"] = str((int(bad["public"]["out"]) + 1) % gl.P)
    assert not stark.verify_chunk(bad, PARAMS)


def test_reject_tampered_trace_opening():
    data = [9, 9, 9, 9, 9]
    proof = stark.prove_chunk(data, iv=2, params=PARAMS)
    bad = copy.deepcopy(proof)
    bad["trace_openings"][0][0]["row"][0] = str(
        (int(bad["trace_openings"][0][0]["row"][0]) + 1) % gl.P
    )
    assert not stark.verify_chunk(bad, PARAMS)


@pytest.mark.slow
def test_reject_tampered_trace_root():
    data = [4, 4, 4, 4]
    proof = stark.prove_chunk(data, iv=0, params=PARAMS)
    bad = copy.deepcopy(proof)
    bad["trace_root"][0] = str(int(bad["trace_root"][0]) ^ 1)
    assert not stark.verify_chunk(bad, PARAMS)


@pytest.mark.slow
def test_output_binds_data():
    p1 = stark.prove_chunk([1, 2, 3, 4], iv=1, params=PARAMS)
    p2 = stark.prove_chunk([1, 2, 3, 5], iv=1, params=PARAMS)
    assert p1["public"]["out"] != p2["public"]["out"]
