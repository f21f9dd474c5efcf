"""Batched chunk prover == serial prover, bit for bit; multi-device DP.

VERDICT round-1 item 5: chunk proving must actually use the mesh's
`chunk` axis.  These tests prove 4 chunks concurrently on the 8-virtual-
device CPU mesh and require byte-identical proofs to the serial
stark.prove_chunk path.
"""

import numpy as np
import pytest

from eigen_zeth_tpu.models import stark, stark_batch
from eigen_zeth_tpu.ops import goldilocks as gl
from eigen_zeth_tpu.parallel import mesh as meshm

RNG = np.random.default_rng(0xBA7C4)

K = 4
DATA_LEN = 40  # -> trace size 64, m=256: exercises 2 FRI fold layers
PARAMS = stark.StarkParams(num_queries=8)  # smaller query loops on CPU


@pytest.fixture(scope="module")
def chunks():
    datas = [
        [int(x) for x in RNG.integers(0, gl.P, size=DATA_LEN, dtype=np.uint64)]
        for _ in range(K)
    ]
    ivs = [int(x) for x in RNG.integers(0, gl.P, size=K, dtype=np.uint64)]
    return datas, ivs


@pytest.fixture(scope="module")
def serial_proofs(chunks):
    datas, ivs = chunks
    return [stark.prove_chunk(d, iv, PARAMS) for d, iv in zip(datas, ivs)]


def test_batched_matches_serial(chunks, serial_proofs):
    datas, ivs = chunks
    got = stark_batch.prove_chunks(datas, ivs, PARAMS)
    assert got == serial_proofs


def test_batched_on_chunk_mesh_matches_serial(chunks, serial_proofs):
    """Chunk axis sharded over 4 devices: same proofs, multi-device run."""
    datas, ivs = chunks
    mesh = meshm.make_mesh(n_domain=2, n_chunk=4)
    got = stark_batch.prove_chunks(datas, ivs, PARAMS, mesh=mesh)
    assert got == serial_proofs


def test_batched_proofs_verify(chunks):
    datas, ivs = chunks
    proofs = stark_batch.prove_chunks(datas, ivs, PARAMS)
    for p in proofs:
        assert stark.verify_chunk(p, PARAMS)


def test_batched_rejects_tamper(chunks):
    datas, ivs = chunks
    proofs = stark_batch.prove_chunks(datas, ivs, PARAMS)
    bad = dict(proofs[0])
    bad["public"] = dict(bad["public"])
    bad["public"]["out"] = str((int(bad["public"]["out"]) + 1) % gl.P)
    assert not stark.verify_chunk(bad, PARAMS)


def test_heterogeneous_lengths_pad_to_common_n(chunks):
    """A short final chunk gets the common trace size n (explicit n)."""
    datas, ivs = chunks
    short = [datas[0], datas[1][:7]]
    proofs = stark_batch.prove_chunks(short, ivs[:2], PARAMS, n=64)
    assert all(int(p["n"]) == 64 for p in proofs)
    for p in proofs:
        assert stark.verify_chunk(p, PARAMS)
