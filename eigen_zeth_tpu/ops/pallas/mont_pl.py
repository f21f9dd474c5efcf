"""Pallas Montgomery-multiply kernel (CIOS, 16-bit limbs in uint32).

One kernel computes a·b·R⁻¹ mod q for a whole tile of elements without
leaving VMEM: the full CIOS loop (L outer steps, each a multiply-
accumulate sweep over L limbs plus the m·q reduction sweep) runs on
16-bit limb planes held as (L, TILE) uint32 vectors.  Compared with the
XLA path (ops/bigint.py mont_mul), this avoids materializing the
(L, L, B) limb-product tensor and the f32 binning matmuls in HBM —
the op becomes pure VPU work with (3L+small)·TILE bytes of traffic.

The radix-2^16 CIOS invariant (x·y + u + v ≤ 2^32-1 for 16-bit words)
keeps every accumulation inside uint32 — no headroom tricks needed.

Layout contract: operands and result are (L, B) uint32, limb-major,
matching MontCtx; the kernel tiles B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK16 = 0xFFFF  # python int: pallas kernels may not capture array constants


def _mont_mul_kernel(L: int, q_limbs, n0: int, a_ref, b_ref, out_ref):
    """CIOS with 16-bit limbs; q_limbs/n0 are python-time constants."""
    a = [a_ref[i] for i in range(L)]
    b = [b_ref[i] for i in range(L)]
    zero = jnp.zeros_like(a[0])
    t = [zero] * (L + 2)
    for i in range(L):
        ai = a[i]
        c = zero
        for j in range(L):
            tmp = t[j] + ai * b[j] + c
            t[j] = tmp & MASK16
            c = tmp >> 16
        tmp = t[L] + c
        t[L] = tmp & MASK16
        t[L + 1] = t[L + 1] + (tmp >> 16)
        # m = t0·n0' mod 2^16 ; t = (t + m·q) >> 16
        m = (t[0] * n0) & MASK16
        tmp = t[0] + m * int(q_limbs[0])
        c = tmp >> 16
        for j in range(1, L):
            tmp = t[j] + m * int(q_limbs[j]) + c
            t[j - 1] = tmp & MASK16
            c = tmp >> 16
        tmp = t[L] + c
        t[L - 1] = tmp & MASK16
        t[L] = t[L + 1] + (tmp >> 16)
        t[L + 1] = zero
    # conditional subtract q (t < 2q)
    extra = t[L]
    ge_gt = zero.astype(jnp.bool_)
    eq = jnp.ones_like(zero, dtype=jnp.bool_)
    for i in range(L - 1, -1, -1):
        qi = int(q_limbs[i])
        ge_gt = ge_gt | (eq & (t[i] > qi))
        eq = eq & (t[i] == qi)
    ge = ge_gt | eq | (extra > 0)
    borrow = zero
    for i in range(L):
        qi = int(q_limbs[i])
        d = t[i] - qi - borrow
        borrow = (d >> 31) & 1
        out_ref[i] = jnp.where(ge, d & MASK16, t[i])


@functools.partial(
    jax.jit, static_argnames=("L", "n0", "q_tuple", "rows", "interpret")
)
def _mont_mul_call(a, b, L, n0, q_tuple, rows, interpret):
    """a, b: (L, R, 128) — limb planes are native (rows, 128) tiles, so
    per-limb slices a_ref[i] need no cross-sublane relayout."""
    total_rows = a.shape[1]
    kernel = functools.partial(_mont_mul_kernel, L, q_tuple, n0)
    grid = (total_rows // rows,)
    spec = pl.BlockSpec((L, rows, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, total_rows, 128), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a, b)


def mont_mul_pallas(ctx, a, b, rows: int = 64, interpret: bool = False):
    """Drop-in for MontCtx.mont_mul on (L, B) operands.

    B is padded to a multiple of rows*128 and viewed as (L, B/128, 128)
    so every limb plane is a stack of native 8x128 tiles."""
    L = ctx.L
    assert a.ndim == 2 and b.ndim == 2, "pallas path expects (L, B)"
    n = a.shape[1]
    lane_rows = max(1, -(-n // 128))
    rows = min(rows, 1 << max(0, (lane_rows - 1).bit_length()))
    pad = (-n) % (rows * 128)
    if pad:
        a = jnp.pad(a, ((0, 0), (0, pad)))
        b = jnp.pad(b, ((0, 0), (0, pad)))
    m = a.shape[1]
    a3 = a.reshape(L, m // 128, 128)
    b3 = b.reshape(L, m // 128, 128)
    out = _mont_mul_call(
        a3, b3, L, ctx.nprime & 0xFFFF, tuple(int(x) for x in ctx.q_limbs_np),
        rows, interpret,
    )
    out = out.reshape(L, m)
    return out[:, :n] if pad else out
