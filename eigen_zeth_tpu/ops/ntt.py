"""Number-theoretic transform over Goldilocks — the prover's hot kernel.

This is the TPU-native replacement for the NTT the reference delegates to
its external eigen-prover gRPC service (SURVEY.md §2.9-bis; the reference
repo itself contains no NTT).  Design:

  * Iterative Cooley-Tukey DIT, natural-order in / natural-order out via a
    single precomputed bit-reversal gather, then log2(N) fully vectorized
    butterfly stages.  Every stage is reshape + slice + field-mul + add/sub
    + concat on static shapes — XLA fuses the uint32 limb chains and keeps
    the VPU lanes dense.  No data-dependent control flow anywhere.
  * Twiddles are generated host-side (python bigints) once per size and
    cached in an NTTPlan pytree; under jit they become on-device constants.
  * A four-step decomposition (N = R·C: column NTTs → twiddle → row NTTs)
    doubles as (a) the cache-blocked path for large N and (b) the exact
    compute/communication split used by the multi-chip NTT in
    parallel/ntt_dist.py, where the middle transpose becomes an
    all_to_all over the device mesh (the reference's analog: batch→chunk
    fan-out over its prover network, proto/prover/v1/prover.proto:49-66).

Convention: ntt(x)[k] = Σ_j x[j]·w^{jk} with w the primitive n-th root
gl.primitive_root_of_unity(n); intt is its exact inverse (scaled by 1/n).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from .goldilocks import GF


class NTTPlan(NamedTuple):
    """Precomputed constants for a size-n transform (a jit-able pytree).

    tw[s] holds the 2^s twiddle factors of butterfly stage s
    (w_{2^{s+1}}^j for j < 2^s).  scale is 1/n for the inverse transform,
    None for the forward one."""

    n: int
    bitrev: np.ndarray  # int32[n] bit-reversal permutation (numpy: trace-safe)
    tw: Tuple[GF, ...]  # per-stage twiddles, stage s: shape (2^s,)
    scale: GF | None  # 1/n (inverse only)


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev.astype(np.int32)


@functools.lru_cache(maxsize=64)
def make_plan(n: int, inverse: bool = False) -> NTTPlan:
    assert n & (n - 1) == 0 and n >= 2, "size must be a power of two"
    w = gl.primitive_root_of_unity(n)
    if inverse:
        w = gl.h_inv(w)
    logn = n.bit_length() - 1
    tw = []
    for s in range(logn):
        half = 1 << s
        # stage-s root has order 2^{s+1}: w_m = w^(n / 2^{s+1})
        wm = gl.h_pow(w, n >> (s + 1))
        tw.append(gl.from_int_np(gl.powers_np(wm, half)))
    # numpy leaves: plans are lru-cached and must stay trace-safe
    scale = gl.from_int_np(np.uint64(gl.h_inv(n))) if inverse else None
    return NTTPlan(n=n, bitrev=_bit_reverse_indices(n), tw=tuple(tw), scale=scale)


def _radix2_stage(x: GF, w: GF, s: int, n: int) -> GF:
    """One DIT radix-2 butterfly stage (pairs at stride 2^s)."""
    batch = x.lo.shape[:-1]
    half = 1 << s
    m = half * 2
    v = gl.reshape(x, batch + (n // m, 2, half))
    lo = GF(v.lo[..., 0, :], v.hi[..., 0, :])
    hi = GF(v.lo[..., 1, :], v.hi[..., 1, :])
    t = gl.mul(hi, GF(jnp.broadcast_to(w.lo, lo.lo.shape), jnp.broadcast_to(w.hi, lo.hi.shape)))
    a = gl.add(lo, t)
    b = gl.sub(lo, t)
    x = GF(
        jnp.concatenate([a.lo[..., None, :], b.lo[..., None, :]], axis=-2),
        jnp.concatenate([a.hi[..., None, :], b.hi[..., None, :]], axis=-2),
    )
    return gl.reshape(x, batch + (n,))


def _butterfly_stages(x: GF, tw: Tuple[GF, ...], n: int) -> GF:
    """Apply all log2(n) DIT butterfly stages along the last axis.

    Input must already be in bit-reversed order.  Stages are fused in
    PAIRS (radix-4): the mul count is identical to radix-2 (1 mul/elem
    per pair of levels) but each fused stage is ONE read-modify-write
    pass over the array instead of two — the NTT is HBM-bound on TPU, so
    halving the passes is the whole win.  The per-level twiddle tables
    already carry everything radix-4 needs: with m = 2^s,
      w1  = tw[s]           (m,)   = w_{2m}^j
      w2  = tw[s+1]         (2m,)  = w_{4m}^j; its upper half is
            w_{4m}^{m+j} = w_4 · w_{4m}^j — the i·w2a factors."""
    batch = x.lo.shape[:-1]
    logn = len(tw)
    s = 0
    if logn & 1:  # odd number of levels: one radix-2 stage first
        x = _radix2_stage(x, tw[0], 0, n)
        s = 1
    while s < logn:
        m = 1 << s
        w1, w2 = tw[s], tw[s + 1]
        v = gl.reshape(x, batch + (n // (4 * m), 4, m))
        a = GF(v.lo[..., 0, :], v.hi[..., 0, :])
        b = GF(v.lo[..., 1, :], v.hi[..., 1, :])
        c = GF(v.lo[..., 2, :], v.hi[..., 2, :])
        d = GF(v.lo[..., 3, :], v.hi[..., 3, :])

        def bc(w: GF, like: GF) -> GF:
            return GF(
                jnp.broadcast_to(w.lo, like.lo.shape),
                jnp.broadcast_to(w.hi, like.hi.shape),
            )

        w2a = GF(w2.lo[:m], w2.hi[:m])
        w2b = GF(w2.lo[m:], w2.hi[m:])  # = w_4 · w2a
        tb = gl.mul(b, bc(w1, b))
        td = gl.mul(d, bc(w1, d))
        u0 = gl.add(a, tb)
        u1 = gl.sub(a, tb)
        v0 = gl.add(c, td)
        v1 = gl.sub(c, td)
        t0 = gl.mul(v0, bc(w2a, v0))
        t1 = gl.mul(v1, bc(w2b, v1))
        outs = (gl.add(u0, t0), gl.add(u1, t1), gl.sub(u0, t0), gl.sub(u1, t1))
        x = GF(
            jnp.concatenate([p.lo[..., None, :] for p in outs], axis=-2),
            jnp.concatenate([p.hi[..., None, :] for p in outs], axis=-2),
        )
        x = gl.reshape(x, batch + (n,))
        s += 2
    return x


def ntt(x: GF, plan: NTTPlan | None = None) -> GF:
    """Forward NTT along the last axis (natural order in and out)."""
    n = x.lo.shape[-1]
    if plan is None:
        plan = make_plan(n)
    assert plan.scale is None and plan.n == n
    x = gl.take(x, plan.bitrev, axis=-1)
    return _butterfly_stages(x, plan.tw, n)


def intt(x: GF, plan: NTTPlan | None = None) -> GF:
    """Inverse NTT along the last axis."""
    n = x.lo.shape[-1]
    if plan is None:
        plan = make_plan(n, inverse=True)
    assert plan.scale is not None and plan.n == n
    x = gl.take(x, plan.bitrev, axis=-1)
    x = _butterfly_stages(x, plan.tw, n)
    s = plan.scale
    return gl.mul(x, GF(jnp.broadcast_to(s.lo, x.lo.shape), jnp.broadcast_to(s.hi, x.hi.shape)))


# ---------------------------------------------------------------------------
# four-step decomposition (cache blocking on one chip; comm split across chips)


class FourStepPlan(NamedTuple):
    n: int
    rows: int  # R
    cols: int  # C
    row_plan: NTTPlan  # size-R transform (applied along axis 0)
    col_plan: NTTPlan  # size-C transform (applied along axis 1)
    twiddle: GF  # (R, C) matrix w^{k1·j2}
    scale: GF | None


@functools.lru_cache(maxsize=32)
def make_four_step_plan(n: int, rows: int, inverse: bool = False) -> FourStepPlan:
    cols = n // rows
    assert rows * cols == n and rows & (rows - 1) == 0 and cols & (cols - 1) == 0
    w = gl.primitive_root_of_unity(n)
    if inverse:
        w = gl.h_inv(w)
    # twiddle[k1, j2] = w^{k1·j2}: all needed exponents are < R·C = n, so
    # one numpy powers ladder + a gather builds the matrix with zero host
    # bigint muls (round 1 looped O(n) python mults).  numpy, NOT device:
    # plans are lru-cached and may be built inside a jit trace — device
    # arrays here would leak tracers (the test_ntt_sharded regression).
    pw = gl.powers_np(w, n)  # (n,) uint64
    idx = np.outer(np.arange(rows, dtype=np.int64), np.arange(cols, dtype=np.int64))
    tw = pw[idx]
    scale = gl.from_int_np(np.uint64(gl.h_inv(n))) if inverse else None
    return FourStepPlan(
        n=n,
        rows=rows,
        cols=cols,
        row_plan=make_plan(rows, inverse),
        col_plan=make_plan(cols, inverse),
        twiddle=gl.from_int_np(tw),
        scale=scale,
    )


def ntt_four_step(x: GF, plan: FourStepPlan) -> GF:
    """Four-step NTT: x natural order (n,) -> X natural order (n,).

    With x viewed as (R, C) row-major [j = j1·C + j2]:
      1. size-R NTTs along axis 0 (the 'column' transforms)
      2. elementwise twiddle w^{k1·j2}
      3. size-C NTTs along axis 1 (the 'row' transforms)
      4. transpose: X[k1 + k2·R] = Y[k1, k2]
    Steps 1-3 are local when the (R, C) matrix is sharded along axis 1;
    only step 3 needs the data resharded along axis 0 — which is the
    all_to_all in the distributed version."""
    R, C = plan.rows, plan.cols
    v = gl.reshape(x, x.lo.shape[:-1] + (R, C))
    # NTT along axis 0: move it last, transform, move back
    v = gl.transpose(v, _swap_last_two(v.lo.ndim))
    v = ntt(v, plan.row_plan) if plan.scale is None else _raw(v, plan.row_plan)
    v = gl.transpose(v, _swap_last_two(v.lo.ndim))
    v = gl.mul(v, _bcast(plan.twiddle, v))
    v = ntt(v, plan.col_plan) if plan.scale is None else _raw(v, plan.col_plan)
    # Y[k1, k2] -> X[k1 + k2 R]: transpose then flatten
    v = gl.transpose(v, _swap_last_two(v.lo.ndim))
    out = gl.reshape(v, x.lo.shape)
    if plan.scale is not None:
        out = gl.mul(out, _bcast(plan.scale, out))
    return out


def _raw(x: GF, plan: NTTPlan) -> GF:
    """Butterflies + bit-reversal without the inverse 1/n scaling
    (the four-step plan applies a single global scale at the end)."""
    n = x.lo.shape[-1]
    x = gl.take(x, plan.bitrev, axis=-1)
    return _butterfly_stages(x, plan.tw, n)


def _swap_last_two(ndim: int):
    axes = list(range(ndim))
    axes[-1], axes[-2] = axes[-2], axes[-1]
    return axes


def _bcast(c: GF, like: GF) -> GF:
    return GF(
        jnp.broadcast_to(c.lo, like.lo.shape), jnp.broadcast_to(c.hi, like.hi.shape)
    )


def intt_four_step(x: GF, plan: FourStepPlan) -> GF:
    assert plan.scale is not None
    return ntt_four_step(x, plan)


# ---------------------------------------------------------------------------
# polynomial helpers


def coset_shift(x: GF, shift: int, inverse: bool = False) -> GF:
    """Multiply coefficient j by shift^j (evaluate on the coset shift·H)."""
    n = x.lo.shape[-1]
    s = gl.h_inv(shift) if inverse else shift % gl.P
    p = gl.powers(s, n)  # device ladder, no host loop
    return gl.mul(x, _bcast(p, x))


# above this size the flat radix-2 graph (concat-heavy, O(n) host plan
# build) loses to the four-step (R, C) decomposition
FOUR_STEP_MIN = 1 << 14


def _four_step_rows(n: int) -> int:
    return 1 << ((n - 1).bit_length() // 2)


def ntt_auto(x: GF, inverse: bool = False) -> GF:
    """Size-adaptive NTT along the last axis: flat radix-2 for small n,
    four-step for production sizes (2^14+)."""
    n = x.lo.shape[-1]
    if n >= FOUR_STEP_MIN:
        plan = make_four_step_plan(n, _four_step_rows(n), inverse)
        return ntt_four_step(x, plan)
    plan = make_plan(n, inverse)
    return intt(x, plan) if inverse else ntt(x, plan)


def intt_auto(x: GF) -> GF:
    return ntt_auto(x, inverse=True)


def lde(coeffs: GF, blowup: int, shift: int = gl.MULTIPLICATIVE_GENERATOR) -> GF:
    """Low-degree extension: evaluate a degree-<n polynomial on the coset
    shift·H of the blowup·n domain (zero-pad coefficients, coset NTT)."""
    n = coeffs.lo.shape[-1]
    m = n * blowup
    pad = [(0, 0)] * (coeffs.lo.ndim - 1) + [(0, m - n)]
    padded = GF(jnp.pad(coeffs.lo, pad), jnp.pad(coeffs.hi, pad))
    return ntt_auto(coset_shift(padded, shift))


def poly_mul(a: GF, b: GF) -> GF:
    """Polynomial product via NTT (sizes padded to 2x power of two)."""
    n = a.lo.shape[-1] + b.lo.shape[-1]
    m = 1 << (n - 1).bit_length()
    pa = [(0, 0)] * (a.lo.ndim - 1) + [(0, m - a.lo.shape[-1])]
    pb = [(0, 0)] * (b.lo.ndim - 1) + [(0, m - b.lo.shape[-1])]
    fa = ntt(GF(jnp.pad(a.lo, pa), jnp.pad(a.hi, pa)))
    fb = ntt(GF(jnp.pad(b.lo, pb), jnp.pad(b.hi, pb)))
    return intt(gl.mul(fa, fb))
