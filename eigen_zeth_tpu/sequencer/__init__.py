"""Sequencer / execution layer — the reference's custom-reth analog.

The reference embeds a full reth node with a custom payload builder
(src/custom_reth/mod.rs:444-794): fee-ordered tx selection, a bridge-tx
filter (only the first bridge-asset call per block), per-tx execution,
and header/root assembly.  This package provides the TPU framework's
hermetic equivalent: a mempool, the same tx-filter semantics, a simple
value-transfer execution model with keccak state/tx roots, and an
auto-mine block producer — enough to drive the full rollup pipeline
without an external EL, with the same observable surfaces (eth_* +
eigenrpc_* RPC, block/status lifecycle).
"""
