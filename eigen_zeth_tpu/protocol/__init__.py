"""Protocol surfaces: prover-service semantics, state machine, KV, RPC.

Mirrors the reference's L2/L3 layers (SURVEY.md §1): the rollup KV store
(src/db/mod.rs), the 4-phase proving state machine (src/prover/provider.rs),
and the ProverService message semantics (proto/prover/v1/prover.proto) —
with the gRPC prover network replaced by the in-process TPU batch prover.
"""
