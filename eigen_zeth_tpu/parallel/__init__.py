"""Multi-chip parallelism: mesh helpers, distributed NTT / MSM.

The reference scales by fanning batches out to an external prover network
over gRPC (proto/prover/v1/prover.proto:49-66) and runs workers as tokio
tasks on one host (src/operator.rs:66-104).  The TPU-native equivalents
(SURVEY.md §2 parallelism inventory):

  * chunk data-parallelism  -> shard_map over a 'chunk' mesh axis
  * NTT domain sharding     -> four-step NTT with all_to_all stage exchange
  * MSM point partitioning  -> per-chip window sums + psum-style reduce
  * communication backend   -> XLA collectives over ICI/DCN, not gRPC
"""
