"""Pipeline parallelism across proving phases — the PP analog.

The reference's GenChunk -> GenChunkProof -> Aggregate -> Final state
machine (src/prover/provider.rs:276-540) runs phases strictly serially,
blocking on its remote prover for each step.  Here the phases form a
device/host pipeline (SURVEY.md §2 parallelism inventory, item 3):

  * chunk proving is device-bound (NTT/Merkle/FRI bulk work)
  * aggregation is host-bound (child verification + digest combine)

PipelinedBatchProver overlaps them: chunk i+1 proves on the device while
chunk i is verified and folded into the aggregation tree on host worker
threads.  The aggregation combine is associative, so the fold runs as a
left fold over completion order with deterministic pairing by index.
"""

from __future__ import annotations

import json
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

from ..protocol.messages import ChunkProof, ProofResultCode
from ..protocol.prover_service import BatchProver


class PipelinedBatchProver:
    """Wraps BatchProver: proves chunks while aggregating finished ones."""

    def __init__(self, prover: BatchProver, agg_workers: int = 2):
        self.prover = prover
        self.agg_workers = agg_workers

    def prove_and_aggregate(
        self, batch_id: str, task_id: str, chunk_count: int,
        chain_id: int, program_name: str, batch_data: str,
    ) -> str:
        """Returns the final recursive (aggregated) proof string.

        Producer: sequential device chunk proving (the device is a single
        resource; parallelism inside a chunk comes from the mesh).
        Consumers: aggregation threads folding completed proofs pairwise
        in index order."""
        import base64

        from ..protocol.prover_service import CHUNK_FIELD_ELEMS, bytes_to_field_elements
        from ..models import stark
        from ..ops import poseidon

        data = base64.b64decode(batch_data)
        elems = bytes_to_field_elements(data)

        done: queue.Queue = queue.Queue()

        def prove_chunk(i: int) -> None:
            chunk = elems[i * CHUNK_FIELD_ELEMS : (i + 1) * CHUNK_FIELD_ELEMS]
            iv = poseidon.hash_elements_host([chain_id, int(task_id), i])[0]
            proof = stark.prove_chunk(chunk, iv, self.prover.stark_params)
            done.put((i, json.dumps({"type": "chunk", "stark": proof})))

        # device producer thread: chunks stream out in order
        producer = threading.Thread(
            target=lambda: [prove_chunk(i) for i in range(chunk_count)], daemon=True
        )
        producer.start()

        # host consumers: aggregate adjacent pairs as soon as both exist
        proofs: List[Optional[str]] = [None] * chunk_count
        aggregated: List[Optional[str]] = [None] * ((chunk_count + 1) // 2)
        with ThreadPoolExecutor(max_workers=self.agg_workers) as pool:
            futures = []
            received = 0
            while received < chunk_count:
                i, proof = done.get()
                proofs[i] = proof
                received += 1
                j = i ^ 1  # pair partner
                if j >= chunk_count:
                    aggregated[i // 2] = proof  # odd tail promotes directly
                elif proofs[j] is not None:
                    a, b = proofs[min(i, j)], proofs[max(i, j)]
                    futures.append(
                        pool.submit(self._agg, batch_id, i // 2, a, b, aggregated)
                    )
            for f in futures:
                f.result()
        producer.join()

        level = [p for p in aggregated if p is not None]
        assert len(level) == len(aggregated)
        # fold the remaining tree levels host-side
        while len(level) > 1:
            nxt = []
            for k in range(0, len(level) - 1, 2):
                res = self.prover.gen_aggregated_proof(batch_id, level[k], level[k + 1])
                assert res.result_code == ProofResultCode.COMPLETED_OK, res.error_message
                nxt.append(res.result_string)
            if len(level) % 2:
                nxt.append(level[-1])
            level = nxt
        if json.loads(level[0]).get("type") == "chunk":
            res = self.prover.gen_aggregated_proof(batch_id, level[0], level[0])
            assert res.result_code == ProofResultCode.COMPLETED_OK
            level = [res.result_string]
        return level[0]

    def _agg(self, batch_id, slot, a, b, out):
        res = self.prover.gen_aggregated_proof(batch_id, a, b)
        assert res.result_code == ProofResultCode.COMPLETED_OK, res.error_message
        out[slot] = res.result_string
