"""Proof systems built on the ops layer: Merkle, FRI, STARK, Groth16."""
