"""gRPC ProverService shim: the reference's 4-phase flow over real gRPC."""

import json

import pytest

from eigen_zeth_tpu.models import groth16, stark
from eigen_zeth_tpu.protocol.grpc_shim import (
    ProverServiceServer,
    ProverStreamClient,
)
from eigen_zeth_tpu.protocol.grpc_gen.prover.v1 import prover_pb2 as pb
from eigen_zeth_tpu.protocol.prover_service import BatchProver

FAST_STARK = stark.StarkParams(blowup=4, num_queries=2, terminal_size=16)


def test_prover_stream_full_flow():
    """Drive GetStatus -> GenBatchChunks -> GenChunkProof -> Aggregate ->
    Final over one bidirectional stream, exactly like the reference client
    (src/prover/provider.rs:276-540)."""
    prover = BatchProver(stark_params=FAST_STARK, use_jit=False, wrap="linear", chunk_trace_rows=16, recursion=False)
    server = ProverServiceServer(prover).start()
    client = ProverStreamClient(f"127.0.0.1:{server.port}")
    try:
        # status
        resp = client.request(lambda r: r.get_status.SetInParent())
        assert resp.get_status.status == pb.GetStatusResponse.Status.STATUS_IDLE

        # chunks
        def chunks(r):
            m = r.gen_batch_proof.gen_batch_chunks
            m.batch_id = "b-17"
            m.batch.block_number.append(17)
            m.chain_id = 12345
            m.program_name = "evm"

        resp = client.request(chunks)
        cr = resp.gen_batch_proof.gen_batch_chunks
        assert cr.result_code == pb.ProofResultCode.COMPLETED_OK
        assert cr.task_id == "0000000017"
        assert len(cr.pre_state_root) == 32

        # chunk proofs
        def prove(r):
            m = r.gen_batch_proof.gen_chunk_proof
            m.batch_id = "b-17"
            m.task_id = cr.task_id
            m.chunk_count = cr.chunk_count
            m.chain_id = 12345
            m.program_name = "evm"
            m.batch_data = cr.batch_data

        resp = client.request(prove)
        pr = resp.gen_batch_proof.gen_chunk_proof
        assert pr.result_code == pb.ProofResultCode.COMPLETED_OK
        proofs = list(pr.batch_proof_result.chunk_proofs)
        assert len(proofs) == cr.chunk_count

        # aggregate (reference forwards first + last, provider.rs:384-390)
        def agg(r):
            m = r.gen_aggregated_proof
            m.batch_id = "b-17"
            m.recursive_proof_1 = proofs[0].proof
            m.recursive_proof_2 = proofs[-1].proof

        resp = client.request(agg)
        ar = resp.gen_aggregated_proof
        assert ar.result_code == pb.ProofResultCode.COMPLETED_OK

        # final
        def final(r):
            m = r.gen_final_proof
            m.batch_id = "b-17"
            m.recursive_proof = ar.result_string
            m.curve_name = "BN128"
            m.aggregator_addr = "0xagg"

        resp = client.request(final)
        fr = resp.gen_final_proof
        assert fr.result_code == pb.ProofResultCode.COMPLETED_OK
        proof = json.loads(fr.final_proof.proof)
        pub = json.loads(fr.final_proof.public_input)
        assert proof["protocol"] == "groth16" and proof["curve"] == "BN128"
        assert groth16.verify(prover.verifying_key, proof, [int(pub[0])])
    finally:
        client.close()
        server.stop()


def test_error_propagates_as_completed_error():
    prover = BatchProver(stark_params=FAST_STARK, use_jit=False, wrap="linear", chunk_trace_rows=16, recursion=False)
    server = ProverServiceServer(prover).start()
    client = ProverStreamClient(f"127.0.0.1:{server.port}")
    try:
        def bad_agg(r):
            m = r.gen_aggregated_proof
            m.batch_id = "b"
            m.recursive_proof_1 = "not json"
            m.recursive_proof_2 = "not json"

        resp = client.request(bad_agg)
        assert (
            resp.gen_aggregated_proof.result_code
            == pb.ProofResultCode.COMPLETED_ERROR
        )
        assert resp.gen_aggregated_proof.error_message
    finally:
        client.close()
        server.stop()
