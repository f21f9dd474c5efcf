"""Pallas TPU kernels for the hot field ops.

The XLA-level limb arithmetic in ops/bigint.py materializes (L, L, B)
limb-product tensors in HBM (the antidiagonal-matmul formulation); these
kernels keep the entire multiply in VMEM and emit only the (L, B) result,
turning the field mul from HBM-bound into VPU-bound.
"""
