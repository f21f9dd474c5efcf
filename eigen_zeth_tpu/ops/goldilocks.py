"""Goldilocks prime field GF(p), p = 2^64 - 2^32 + 1, in uint32 limb form.

This is the base field of the STARK/FRI chunk-proving layer (the compute the
reference delegates to its external eigen-prover service over
proto/prover/v1/prover.proto:9-11; nothing in the reference repo computes
field arithmetic itself — see SURVEY.md §2.9-bis).

TPU-first design decisions:
  * An array of field elements is a pair of uint32 planes (lo, hi) —
    structure-of-limbs, so each plane maps densely onto VPU lanes and all
    field ops are elementwise uint32 ops with no cross-lane traffic.
  * Multiplication uses 16-bit half-limb products (ops/u32.mulhilo32) and
    the special form of p for reduction:
        2^64 ≡ 2^32 - 1 (mod p)        2^96 ≡ -1 (mod p)
    so a 128-bit product n = n_lo + 2^64·c + 2^96·d reduces as
        n ≡ n_lo + c·(2^32 - 1) - d (mod p)
    entirely in 32-bit words — no Montgomery form needed.
  * Values are kept canonical (< p) after every op, so equality is plain
    limb equality and serialization is direct.
  * Inversion is exponentiation by p-2 (fixed 64-bit exponent): fully
    parallel across lanes, unlike the sequential Montgomery batch trick.

All public ops are jit-safe: static shapes, no data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .u32 import add64, geq64, mul64, sub64

P = 0xFFFFFFFF00000001  # 2^64 - 2^32 + 1
P_LO = jnp.uint32(0x00000001)
P_HI = jnp.uint32(0xFFFFFFFF)
NEG_ORDER = jnp.uint32(0xFFFFFFFF)  # 2^64 - p = 2^32 - 1

# Multiplicative group order p-1 = 2^32 · 3 · 5 · 17 · 257 · 65537.
# 2^32 | p-1 means radix-2 NTTs exist up to size 2^32.
TWO_ADICITY = 32
# 7 generates the multiplicative group; g = 7^((p-1)/2^32) is a primitive
# 2^32-th root of unity (standard for this field).
MULTIPLICATIVE_GENERATOR = 7


class GF(NamedTuple):
    """Array of Goldilocks elements as two uint32 planes (little-endian)."""

    lo: jnp.ndarray
    hi: jnp.ndarray

    @property
    def shape(self):
        return self.lo.shape

    def __len__(self):
        return self.lo.shape[0]


# ---------------------------------------------------------------------------
# host <-> device conversion


def from_int_np(values, shape=None) -> GF:
    """GF with NUMPY planes — safe to cache across jit traces (numpy
    leaves become fresh constants in every trace; jnp arrays created
    inside a trace must never be cached)."""
    arr = np.asarray(values, dtype=np.uint64) % np.uint64(P)
    if shape is not None:
        arr = arr.reshape(shape)
    lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    return GF(lo, hi)


def from_int(values, shape=None) -> GF:
    """Build a GF array from python ints / numpy uint64 (host-side)."""
    g = from_int_np(values, shape)
    return GF(jnp.asarray(g.lo), jnp.asarray(g.hi))


def to_int(x: GF) -> np.ndarray:
    """GF array -> numpy uint64 (host-side)."""
    lo = np.asarray(jax.device_get(x.lo), dtype=np.uint64)
    hi = np.asarray(jax.device_get(x.hi), dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def zeros(shape) -> GF:
    z = jnp.zeros(shape, dtype=jnp.uint32)
    return GF(z, z)


def ones(shape) -> GF:
    return GF(jnp.ones(shape, dtype=jnp.uint32), jnp.zeros(shape, dtype=jnp.uint32))


def full(shape, value: int) -> GF:
    value %= P
    return GF(
        jnp.full(shape, value & 0xFFFFFFFF, dtype=jnp.uint32),
        jnp.full(shape, value >> 32, dtype=jnp.uint32),
    )


# ---------------------------------------------------------------------------
# core arithmetic


def _canonical(lo, hi):
    """Conditional subtract p; input must be < 2p (as a 64-bit value)."""
    ge = geq64(lo, hi, P_LO, P_HI)
    slo, shi, _ = sub64(lo, hi, P_LO, P_HI)
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


def add(a: GF, b: GF) -> GF:
    lo, hi, carry = add64(a.lo, a.hi, b.lo, b.hi)
    # carry: +2^64 ≡ +(2^32-1); cannot re-carry (see module docstring proof)
    adj = jnp.where(carry.astype(bool), NEG_ORDER, jnp.uint32(0))
    lo2, hi2, _ = add64(lo, hi, adj, jnp.uint32(0))
    return GF(*_canonical(lo2, hi2))


def sub(a: GF, b: GF) -> GF:
    lo, hi, borrow = sub64(a.lo, a.hi, b.lo, b.hi)
    # borrow: -2^64 ≡ -(2^32-1); cannot re-borrow
    adj = jnp.where(borrow.astype(bool), NEG_ORDER, jnp.uint32(0))
    lo2, hi2, _ = sub64(lo, hi, adj, jnp.uint32(0))
    return GF(lo2, hi2)


def neg(a: GF) -> GF:
    lo, hi, _ = sub64(P_LO, P_HI, a.lo, a.hi)
    is_zero = (a.lo == 0) & (a.hi == 0)
    return GF(
        jnp.where(is_zero, jnp.uint32(0), lo),
        jnp.where(is_zero, jnp.uint32(0), hi),
    )


def reduce128(r0, r1, r2, r3) -> GF:
    """Reduce a 128-bit value (four LE uint32 words) mod p.

    n = x_lo + 2^64·r2 + 2^96·r3 ≡ x_lo + r2·(2^32-1) - r3 (mod p)."""
    # t0 = x_lo - r3, with -2^64 ≡ -(2^32-1) adjustment on borrow
    t0_lo, t0_hi, borrow = sub64(r0, r1, r3, jnp.uint32(0))
    adj = jnp.where(borrow.astype(bool), NEG_ORDER, jnp.uint32(0))
    t0_lo, t0_hi, _ = sub64(t0_lo, t0_hi, adj, jnp.uint32(0))
    # t1 = r2 * (2^32 - 1) = (r2 << 32) - r2, branchless
    nz = (r2 != 0).astype(jnp.uint32)
    t1_lo = jnp.uint32(0) - r2
    t1_hi = r2 - nz
    # res = t0 + t1, with +2^64 ≡ +(2^32-1) adjustment on carry
    res_lo, res_hi, carry = add64(t0_lo, t0_hi, t1_lo, t1_hi)
    adj = jnp.where(carry.astype(bool), NEG_ORDER, jnp.uint32(0))
    res_lo, res_hi, _ = add64(res_lo, res_hi, adj, jnp.uint32(0))
    return GF(*_canonical(res_lo, res_hi))


def mul(a: GF, b: GF) -> GF:
    return reduce128(*mul64(a.lo, a.hi, b.lo, b.hi))


def square(a: GF) -> GF:
    return mul(a, a)


def mul_scalar(a: GF, c: int) -> GF:
    """Multiply by a compile-time constant."""
    c %= P
    b = GF(jnp.uint32(c & 0xFFFFFFFF), jnp.uint32(c >> 32))
    return mul(a, GF(jnp.broadcast_to(b.lo, a.lo.shape), jnp.broadcast_to(b.hi, a.hi.shape)))


def pow_const(a: GF, e: int) -> GF:
    """a^e for a compile-time constant exponent (square-and-multiply,
    unrolled at trace time — ≤ 2·64 muls)."""
    if e == 0:
        return ones(a.lo.shape)
    e %= P - 1
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result if result is not None else ones(a.lo.shape)


def inv(a: GF) -> GF:
    """Multiplicative inverse via a^(p-2); inv(0) = 0 by convention."""
    return pow_const(a, P - 2)


def batch_inv(a: GF) -> GF:
    """Montgomery batch inversion along the last axis: ONE field
    exponentiation + O(n) muls, vs pow_const's ~96 muls per element.

      prefix_i = a_0…a_i,  suffix_i = a_i…a_{n-1}
      1/a_i = prefix_{i-1} · suffix_{i+1} · 1/(a_0…a_{n-1})

    Work-efficient associative scans keep everything on device.  All
    inputs must be nonzero (the STARK uses this on coset denominators,
    which never vanish on shift·H)."""
    ax = a.lo.ndim - 1  # reverse=True requires a nonnegative axis
    prefix = jax.lax.associative_scan(mul, a, axis=ax)
    suffix = jax.lax.associative_scan(mul, a, axis=ax, reverse=True)
    total = GF(prefix.lo[..., -1:], prefix.hi[..., -1:])
    total_inv = inv(total)

    def shift_fill_one(x: GF, up: bool) -> GF:
        one = ones(x.lo.shape[:-1] + (1,))
        if up:  # prefix_{i-1}: shift right, fill 1 at i=0
            return GF(
                jnp.concatenate([one.lo, x.lo[..., :-1]], axis=-1),
                jnp.concatenate([one.hi, x.hi[..., :-1]], axis=-1),
            )
        return GF(  # suffix_{i+1}: shift left, fill 1 at i=n-1
            jnp.concatenate([x.lo[..., 1:], one.lo], axis=-1),
            jnp.concatenate([x.hi[..., 1:], one.hi], axis=-1),
        )

    excl = mul(shift_fill_one(prefix, True), shift_fill_one(suffix, False))
    return mul(excl, GF(jnp.broadcast_to(total_inv.lo, excl.lo.shape),
                        jnp.broadcast_to(total_inv.hi, excl.hi.shape)))


def powers(base: int, n: int) -> GF:
    """[base^0, …, base^(n-1)] built ON DEVICE: a doubling ladder — block
    [2^k, 2^{k+1}) = block [0, 2^k) · base^(2^k) — is log2(n) full-width
    vector muls (~n mul-slots total).  Replaces the O(n) host bigint
    power loops VERDICT flagged (fri.py:56-62, stark.py:105-107: a
    4M-iteration python loop at the 2^22 BASELINE size)."""
    base %= P
    if n <= 0:
        return zeros((0,))
    out = ones((1,))
    step = base
    size = 1
    while size < n:
        blk = min(size, n - size)
        head = GF(out.lo[:blk], out.hi[:blk])
        nxt = mul(head, full((blk,), step))
        out = GF(
            jnp.concatenate([out.lo, nxt.lo]), jnp.concatenate([out.hi, nxt.hi])
        )
        step = h_mul(step, step)
        size += blk
    return out


def eq(a: GF, b: GF) -> jnp.ndarray:
    return (a.lo == b.lo) & (a.hi == b.hi)


def is_zero(a: GF) -> jnp.ndarray:
    return (a.lo == 0) & (a.hi == 0)


def select(pred, a: GF, b: GF) -> GF:
    """Elementwise pred ? a : b."""
    return GF(jnp.where(pred, a.lo, b.lo), jnp.where(pred, a.hi, b.hi))


# ---------------------------------------------------------------------------
# structural helpers (jit-safe reshapes / indexing over both planes)


def reshape(a: GF, shape) -> GF:
    return GF(a.lo.reshape(shape), a.hi.reshape(shape))


def transpose(a: GF, axes=None) -> GF:
    return GF(jnp.transpose(a.lo, axes), jnp.transpose(a.hi, axes))


def concatenate(parts: Sequence[GF], axis=0) -> GF:
    return GF(
        jnp.concatenate([p.lo for p in parts], axis=axis),
        jnp.concatenate([p.hi for p in parts], axis=axis),
    )


def take(a: GF, idx, axis=0) -> GF:
    return GF(jnp.take(a.lo, idx, axis=axis), jnp.take(a.hi, idx, axis=axis))


def dynamic_slice_in_dim(a: GF, start, size, axis=0) -> GF:
    return GF(
        jax.lax.dynamic_slice_in_dim(a.lo, start, size, axis),
        jax.lax.dynamic_slice_in_dim(a.hi, start, size, axis),
    )


def stack(parts: Sequence[GF], axis=0) -> GF:
    return GF(
        jnp.stack([p.lo for p in parts], axis=axis),
        jnp.stack([p.hi for p in parts], axis=axis),
    )


# ---------------------------------------------------------------------------
# host-side scalar math (python ints; for twiddle/constant generation)


def h_mul(a: int, b: int) -> int:
    return (a * b) % P


# --- vectorized numpy field mul (trace-safe twiddle/constant generation) ---

# uint64 wraparound is intentional in np_mulmod/np_addmod; np.seterr is
# THREAD-LOCAL, so each helper scopes its own errstate (worker threads —
# the settlement provers — would otherwise warn on every wrap)
np.seterr(over="ignore")
_M32 = np.uint64(0xFFFFFFFF)
_U32 = np.uint64(32)
def _over_ignore():
    return np.errstate(over="ignore")


def np_mulmod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise (a·b) mod P on uint64 numpy arrays — 32-bit-limb
    schoolbook + the 2^64 ≡ 2^32−1, 2^96 ≡ −1 Goldilocks fold.  Pure
    numpy, so NTT-plan builders can call it inside a jit trace (device
    arrays would leak tracers into the lru-cached plans — the round-2
    regression behind test_ntt_sharded_matches_single).

    Thread-safe w.r.t. overflow warnings (scoped errstate)."""
    with _over_ignore():
        return _np_mulmod_impl(a, b)


def _np_mulmod_impl(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    al, ah = a & _M32, a >> _U32
    bl, bh = b & _M32, b >> _U32
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl  # may wrap
    c1 = (mid < lh).astype(np.uint64)
    mid_l = (mid & _M32) << _U32
    lo = ll + mid_l  # may wrap
    c2 = (lo < ll).astype(np.uint64)
    hi = hh + (mid >> _U32) + (c1 << _U32) + c2  # exact, < 2^64
    # fold t = hi·2^64 + lo:  t ≡ lo + hi_lo·(2^32−1) − hi_hi  (mod P)
    hi_l, hi_h = hi & _M32, hi >> _U32
    t0 = lo - hi_h
    t0 = np.where(lo < hi_h, t0 - _M32, t0)  # borrow: wrap ≡ +P
    t1 = hi_l * _M32
    res = t0 + t1
    res = np.where(res < t0, res + _M32, res)  # carry: wrap ≡ −P → re-add
    return np.where(res >= np.uint64(P), res - np.uint64(P), res)


def powers_np(base: int, n: int) -> np.ndarray:
    """[base^0, …, base^(n-1)] mod P as numpy uint64 — the doubling
    ladder (block [2^k, 2^{k+1}) = block · base^(2^k)) with np_mulmod:
    log2(n) vectorized steps, no python bigint loop, trace-safe."""
    base %= P
    out = np.empty(max(n, 1), dtype=np.uint64)
    out[0] = 1
    step = base
    size = 1
    while size < n:
        blk = min(size, n - size)
        out[size : size + blk] = np_mulmod(out[:blk], np.uint64(step))
        step = h_mul(step, step)
        size += blk
    return out[:n]


def np_addmod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise (a+b) mod P on canonical uint64 numpy arrays."""
    with _over_ignore():
        a = np.asarray(a, dtype=np.uint64)
        b = np.asarray(b, dtype=np.uint64)
        s = a + b  # may wrap: a,b < P < 2^64 so s mod 2^64 = s - 2^64·c
        wrap = s < a
        # 2^64 ≡ 2^32 − 1 (mod P)
        s = np.where(wrap, s + _M32, s)
        return np.where(s >= np.uint64(P), s - np.uint64(P), s)


def np_submod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise (a−b) mod P on canonical uint64 numpy arrays.

    Thread-safe w.r.t. overflow warnings (scoped errstate — np.seterr is
    thread-local; the settlement prover calls this from worker threads
    via the AIR verifier/recursion paths)."""
    with _over_ignore():
        a = np.asarray(a, dtype=np.uint64)
        b = np.asarray(b, dtype=np.uint64)
        d = a - b
        return np.where(a < b, d + np.uint64(P), d)


def np_ntt(values: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Host radix-2 NTT over numpy uint64 (vectorized np_mulmod butterflies).

    Used by the AIR verifier to build periodic-column interpolants without
    touching a device — the verifier must run host-only."""
    a = np.asarray(values, dtype=np.uint64).copy()
    n = len(a)
    assert n & (n - 1) == 0
    if n == 1:
        return a
    # bit-reversal permutation
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    bits = n.bit_length() - 1
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    a = a[rev]
    size = 2
    while size <= n:
        w = primitive_root_of_unity(size)
        if inverse:
            w = h_inv(w)
        ws = powers_np(w, size // 2)
        blk = a.reshape(n // size, size)
        lo, hi = blk[:, : size // 2], blk[:, size // 2 :]
        t = np_mulmod(hi, ws[None, :])
        a = np.concatenate([np_addmod(lo, t), np_submod(lo, t)], axis=1).reshape(n)
        size *= 2
    if inverse:
        a = np_mulmod(a, np.uint64(h_inv(n)))
    return a


def np_intt(values: np.ndarray) -> np.ndarray:
    return np_ntt(values, inverse=True)


def h_pow(a: int, e: int) -> int:
    return pow(a, e, P)


def h_inv(a: int) -> int:
    return pow(a, P - 2, P)


def primitive_root_of_unity(order: int) -> int:
    """Primitive `order`-th root of unity; order must divide 2^32."""
    assert order & (order - 1) == 0 and order <= (1 << TWO_ADICITY)
    g = pow(MULTIPLICATIVE_GENERATOR, (P - 1) // (1 << TWO_ADICITY), P)
    return pow(g, (1 << TWO_ADICITY) // order, P)


def random_gf(shape, rng: np.random.Generator) -> GF:
    """Uniform random canonical elements (host-side, for tests/benches)."""
    vals = rng.integers(0, P, size=shape, dtype=np.uint64)
    return from_int(vals)
