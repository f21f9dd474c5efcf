"""Prover protocol messages — dataclass mirror of prover.proto semantics.

Reference: proto/prover/v1/prover.proto.  The wire transport changes (the
reference's tonic gRPC stream becomes an in-process call / host RPC shim),
but the message fields, the task_id convention (batch number left-padded
with zeros to 10 characters, prover.proto:49-54), the result codes, and
the step structure are preserved so an eigen-zeth-side client maps 1:1.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum
from typing import List, Optional


class ProofResultCode(IntEnum):  # prover.proto:153-156
    COMPLETED_OK = 0
    COMPLETED_ERROR = 1


def make_task_id(batch: int) -> str:
    """prover.proto:49-54: zero-pad the batch number to 10 characters."""
    return str(int(batch)).zfill(10)


# --- GenBatchProof step 1: chunk the batch (prover.proto:49-66) ------------


@dataclass
class GenBatchChunks:
    batch_id: str
    block_numbers: List[int]
    chain_id: int
    program_name: str


@dataclass
class GenBatchChunksResult:  # prover.proto:80-91
    batch_id: str
    task_id: str
    result_code: ProofResultCode
    chunk_count: int
    batch_data: str
    pre_state_root: bytes
    post_state_root: bytes
    error_message: str = ""


# --- GenBatchProof step 2: prove each chunk (prover.proto:56-66,93-111) ----


@dataclass
class GenChunkProof:
    batch_id: str
    task_id: str
    chunk_count: int
    chain_id: int
    program_name: str
    batch_data: str


@dataclass
class ChunkProof:  # prover.proto:107-111
    chunk_id: int
    proof_key: str
    proof: str


@dataclass
class GenChunkProofResult:  # prover.proto:93-105
    batch_id: str
    task_id: str
    result_code: ProofResultCode
    chunk_proofs: List[ChunkProof] = field(default_factory=list)
    error_message: str = ""


# --- aggregation (prover.proto:115-126) ------------------------------------


@dataclass
class GenAggregatedProof:
    batch_id: str
    recursive_proof_1: str
    recursive_proof_2: str


@dataclass
class GenAggregatedProofResult:
    batch_id: str
    result_code: ProofResultCode
    result_string: str = ""  # the recursive proof
    error_message: str = ""


# --- final proof (prover.proto:130-148) ------------------------------------


@dataclass
class GenFinalProof:
    batch_id: str
    recursive_proof: str
    curve_name: str
    aggregator_addr: str


@dataclass
class FinalProof:  # prover.proto:145-148
    proof: str
    public_input: str


@dataclass
class GenFinalProofResult:
    batch_id: str
    result_code: ProofResultCode
    result_string: str = ""
    final_proof: Optional[FinalProof] = None
    error_message: str = ""


# --- status (prover.proto:161-190) -----------------------------------------


@dataclass
class ProverStatus:
    last_computed_request_id: str = ""
    last_computed_end_time: int = 0
    current_computing_request_id: str = ""
    current_computing_start_time: int = 0
    version_proto: str = "v1"
    version_server: str = "eigen-zeth-tpu-0.1"
    pending_request_queue_ids: List[str] = field(default_factory=list)
    prover_name: str = "ezt-tpu-prover"
    prover_id: str = "ezt-0"
    number_of_cores: int = 0
    total_memory: int = 0
    free_memory: int = 0
    fork_id: int = 0


@dataclass
class GetStatusResult:
    status: str  # BOOTING | COMPUTING | IDLE | HALT
    prover_status: ProverStatus
