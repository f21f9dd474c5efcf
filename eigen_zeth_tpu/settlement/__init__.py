"""Settlement layer: L1 verifier proof encoding, Settlement impls, workers.

Mirrors the reference's L4c settlement stack (SURVEY.md §2.15-2.19):
the 10-method Settlement trait (src/settlement/mod.rs:26-111), the
Ethereum contract-call encoding (src/settlement/ethereum/,
contracts/EigenZkVM.json), the bridge-service HTTP client
(src/settlement/custom/methods.rs), and the proof/verify/rollup workers
(src/settlement/worker.rs).
"""
