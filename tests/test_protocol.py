"""Protocol layer: KV store, prover service steps, resumable pipeline."""

import json
import os

import pytest

from eigen_zeth_tpu.models import stark
from eigen_zeth_tpu.protocol import kv, vectors
from eigen_zeth_tpu.protocol.messages import ProofResultCode, make_task_id
from eigen_zeth_tpu.protocol.prover_service import (
    BatchProver,
    SyntheticExecutor,
    bytes_to_field_elements,
    chunk_digest,
)
from eigen_zeth_tpu.protocol.state_machine import (
    STEP_AGGREGATE,
    STEP_CHUNK_PROOF,
    ProverPipeline,
    StepRecord,
)

FAST_STARK = stark.StarkParams(blowup=4, num_queries=2, terminal_size=16)


def make_prover():
    return BatchProver(stark_params=FAST_STARK, use_jit=False, wrap="linear", chunk_trace_rows=16, recursion=False)


# --- KV --------------------------------------------------------------------


def test_memdb_roundtrip():
    db = kv.MemDb()
    db.put(b"k", b"v")
    assert db.get(b"k") == b"v"
    assert db.delete(b"k") == b"v"
    assert db.get(b"k") is None


def test_filedb_durability(tmp_path):
    path = str(tmp_path / "db.log")
    db = kv.FileDb(path)
    db.put_u64(kv.KEY_NEXT_BATCH, 7)
    db.put_status(3, kv.Status.Sequenced)
    db.put(b"gone", b"x")
    db.delete(b"gone")
    db.close()
    db2 = kv.FileDb(path)
    assert db2.get_u64(kv.KEY_NEXT_BATCH) == 7
    assert db2.get_status(3) == kv.Status.Sequenced
    assert db2.get(b"gone") is None
    db2.close()


def test_proof_result_json_roundtrip():
    pr = kv.ProofResult(5, "proof", "pub", b"\x01" * 32, b"\x02" * 32)
    back = kv.ProofResult.from_json(pr.to_json())
    assert back == pr


def test_task_id_padding():
    assert make_task_id(1) == "0000000001"  # prover.proto:49-54 convention
    assert make_task_id(1234567890) == "1234567890"


# --- prover service steps ---------------------------------------------------


def test_gen_batch_chunks():
    p = make_prover()
    res = p.gen_batch_chunks("b1", [5], 12345, "evm")
    assert res.result_code == ProofResultCode.COMPLETED_OK
    assert res.task_id == "0000000005"
    assert res.chunk_count >= 1
    assert len(res.pre_state_root) == 32 and len(res.post_state_root) == 32
    # deterministic
    res2 = p.gen_batch_chunks("b1", [5], 12345, "evm")
    assert res2.batch_data == res.batch_data
    assert res2.post_state_root == res.post_state_root


def test_chunk_prove_aggregate_final_end_to_end():
    p = make_prover()
    chunks = p.gen_batch_chunks("b1", [7], 12345, "evm")
    proofs = p.gen_chunk_proof(
        "b1", chunks.task_id, chunks.chunk_count, 12345, "evm", chunks.batch_data
    )
    assert proofs.result_code == ProofResultCode.COMPLETED_OK
    assert len(proofs.chunk_proofs) == chunks.chunk_count
    # every chunk proof verifies independently
    for cp in proofs.chunk_proofs:
        node = json.loads(cp.proof)
        assert stark.verify_chunk(node["stark"], FAST_STARK)

    agg = p.gen_aggregated_proof(
        "b1", proofs.chunk_proofs[0].proof, proofs.chunk_proofs[-1].proof
    )
    assert agg.result_code == ProofResultCode.COMPLETED_OK

    final = p.gen_final_proof("b1", agg.result_string, "BN128", "0xaggregator")
    assert final.result_code == ProofResultCode.COMPLETED_OK
    proof = json.loads(final.final_proof.proof)
    assert proof["protocol"] == "groth16" and proof["curve"] == "BN128"
    pub = json.loads(final.final_proof.public_input)
    assert len(pub) == 1  # single field element, reference schema
    from eigen_zeth_tpu.models import groth16

    assert groth16.verify(p.verifying_key, proof, [int(pub[0])])


def test_aggregate_rejects_invalid_chunk():
    p = make_prover()
    chunks = p.gen_batch_chunks("b1", [9], 12345, "evm")
    proofs = p.gen_chunk_proof(
        "b1", chunks.task_id, chunks.chunk_count, 12345, "evm", chunks.batch_data
    )
    node = json.loads(proofs.chunk_proofs[0].proof)
    node["stark"]["public"]["out"] = str(
        (int(node["stark"]["public"]["out"]) + 1)
    )
    bad = json.dumps(node)
    res = p.gen_aggregated_proof("b1", bad, proofs.chunk_proofs[-1].proof)
    assert res.result_code == ProofResultCode.COMPLETED_ERROR


def test_debug_proof_replays_reference_vectors(monkeypatch):
    monkeypatch.setenv("DEBUG_PROOF", "TRUE")
    from eigen_zeth_tpu.utils import config

    config.global_env.cache_clear()
    try:
        p = make_prover()
        res = p.gen_final_proof("b", "{}", "BN128", "0x0")
        assert res.result_code == ProofResultCode.COMPLETED_OK
        assert json.loads(res.final_proof.proof) == vectors.reference_proof()
        assert (
            json.loads(res.final_proof.public_input)
            == vectors.reference_public_input()
        )
    finally:
        config.global_env.cache_clear()


# --- pipeline ----------------------------------------------------------------


def test_pipeline_end_to_end_and_record_cleared():
    db = kv.MemDb()
    pipe = ProverPipeline(db, make_prover(), aggregator_addr="0xagg")
    result = pipe.execute(11)
    assert result.block_number == 11
    proof = json.loads(result.proof)
    assert proof["protocol"] == "groth16"
    assert db.get(kv.KEY_PROVE_STEP_RECORD) is None  # cleared at End


def test_pipeline_resumes_mid_flight():
    """Simulate a crash after chunk proving: a fresh pipeline must resume
    from the persisted record without redoing earlier phases."""
    db = kv.MemDb()
    prover = make_prover()
    pipe = ProverPipeline(db, prover, aggregator_addr="0xagg")
    batch_id = "batch-13"
    rec = pipe._load(13)
    # drive manually up to Aggregate, persisting like execute() does
    while rec.step != STEP_AGGREGATE:
        rec = pipe._advance(rec, batch_id)
        pipe._save(rec)
    # "crash": new pipeline instance over the same DB
    pipe2 = ProverPipeline(db, prover, aggregator_addr="0xagg")
    calls = {"n": 0}
    orig = prover.gen_chunk_proof

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    prover.gen_chunk_proof = counting
    result = pipe2.execute(13)
    assert calls["n"] == 0, "chunk proving must not rerun after resume"
    assert json.loads(result.proof)["protocol"] == "groth16"


def test_pipeline_stale_record_restarts():
    db = kv.MemDb()
    db.put(
        kv.KEY_PROVE_STEP_RECORD,
        StepRecord(99, STEP_CHUNK_PROOF, {"bogus": True}).to_json().encode(),
    )
    pipe = ProverPipeline(db, make_prover(), aggregator_addr="0xagg")
    result = pipe.execute(3)  # different batch: record is stale
    assert result.block_number == 3


def test_gen_chunk_proof_routes_through_batched_prover(monkeypatch):
    """With a device (use_jit=True), multi-chunk batches go through
    stark_batch.prove_chunks (chunk DP path), not the serial loop."""
    import base64

    from eigen_zeth_tpu.models import stark_batch

    calls = {}

    def fake_prove_chunks(chunks, ivs, params, n=None, mesh=None):
        calls["k"] = len(chunks)
        calls["mesh"] = mesh
        return [stark.prove_chunk(c, iv, params) for c, iv in zip(chunks, ivs)]

    monkeypatch.setattr(stark_batch, "prove_chunks", fake_prove_chunks)
    prover = BatchProver(stark_params=FAST_STARK, use_jit=True, wrap="linear", chunk_trace_rows=16, recursion=False)
    data = bytes(range(256)) * 4  # 147 elems -> 2 chunks at CHUNK_FIELD_ELEMS=120
    res = prover.gen_chunk_proof(
        batch_id="b1",
        task_id="0000000001",
        chunk_count=2,
        chain_id=1,
        program_name="p",
        batch_data=base64.b64encode(data).decode(),
    )
    assert res.result_code == ProofResultCode.COMPLETED_OK
    assert calls["k"] == 2 and calls["mesh"] is None
    for cp in res.chunk_proofs:
        node = json.loads(cp.proof)
        assert stark.verify_chunk(node["stark"], FAST_STARK)
