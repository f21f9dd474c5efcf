"""Pipelined chunk proving + aggregation (PP analog) + profiling utils."""

import json

from eigen_zeth_tpu.models import stark
from eigen_zeth_tpu.parallel.pipeline import PipelinedBatchProver
from eigen_zeth_tpu.protocol.messages import ProofResultCode
from eigen_zeth_tpu.protocol.prover_service import BatchProver
from eigen_zeth_tpu.utils.profiling import METRICS, Metrics, profile_trace

FAST_STARK = stark.StarkParams(blowup=4, num_queries=2, terminal_size=16)


def test_pipelined_prover_matches_serial_semantics():
    prover = BatchProver(stark_params=FAST_STARK, use_jit=False, wrap="linear", chunk_trace_rows=16, recursion=False)
    chunks = prover.gen_batch_chunks("b", list(range(21, 51)), 12345, "evm")
    assert chunks.chunk_count >= 2  # multiple chunks so the pipeline overlaps

    piped = PipelinedBatchProver(prover, agg_workers=2)
    recursive = piped.prove_and_aggregate(
        "b", chunks.task_id, chunks.chunk_count, 12345, "evm", chunks.batch_data
    )
    node = json.loads(recursive)
    assert node["type"] == "aggregated"
    # the aggregation output feeds the final wrap and self-verifies
    final = prover.gen_final_proof("b", recursive, "BN128", "0xagg")
    assert final.result_code == ProofResultCode.COMPLETED_OK


def test_metrics_and_trace_noop():
    m = Metrics()
    m.inc("proofs")
    with m.timed("phase"):
        pass
    rep = m.report()
    assert rep["counters"]["proofs"] == 1
    assert rep["timings"]["phase"]["count"] == 1
    with profile_trace(None):  # no-op without a log dir
        pass
