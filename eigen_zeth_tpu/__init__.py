"""eigen_zeth_tpu — a TPU-native zkEVM proving-primitive framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
0xEigenLabs/eigen-zeth proving pipeline.  Where eigen-zeth is the *client* of
an external gRPC prover network (reference: proto/prover/v1/prover.proto:9-11,
src/prover/provider.rs:1-6), this package IS the prover: Goldilocks / BN254
field arithmetic as limb-decomposed uint32 kernels, radix-2/4 NTT with
all-to-all butterfly-stage exchange over a device mesh, Pippenger MSM with
psum bucket reduction, vectorized Poseidon / Keccak transcript hashing, a
FRI polynomial-commitment layer, and a Groth16/BN128 final wrap emitting
proofs in the reference's exact JSON schema (reference: proof/proof.json,
proof/public_input.json).

Layout:
  ops/        field arithmetic, NTT, MSM, hashing (JAX + Pallas kernels)
  parallel/   mesh helpers, distributed NTT / MSM (shard_map + collectives)
  models/     proof systems: Merkle, FRI, STARK chunk prover, Groth16
  protocol/   prover service semantics, state machine, KV store, RPC
  settlement/ proof encoding for the L1 verifier + pipeline workers
  utils/      config, roofline, logging
  native/     C++ runtime pieces (KV store) + ctypes bindings
"""

__version__ = "0.1.0"
