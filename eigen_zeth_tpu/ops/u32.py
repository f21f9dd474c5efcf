"""uint32 multi-word primitives — the substrate for all field arithmetic.

TPUs have no native wide integer multiply: the VPU operates on 32-bit lanes
and `uint32 * uint32` yields only the low 32 bits of the product.  Every
field multiply in this framework is therefore built from 16x16->32-bit limb
products plus explicit carry propagation, vectorized across lanes.  This
module provides the word-level building blocks:

  * mulhilo32   — full 32x32 -> 64-bit product as (lo, hi) uint32 words
  * add64/sub64 — 64-bit add/sub on (lo, hi) uint32 pairs with carry/borrow
  * adc/sbb     — 32-bit add/sub with carry in/out

All functions are elementwise over arbitrary-shaped uint32 arrays and are
safe under jit (no data-dependent control flow).

Replaces (TPU-native redesign, not a port): the u64/u128 scalar arithmetic
that the reference's external eigen-prover service performs on CPU/GPU
(reference: the prover behind proto/prover/v1/prover.proto:9-11; nothing in
the reference repo itself computes field arithmetic).
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
MASK16 = jnp.uint32(0xFFFF)


def u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


def mulhilo32(a, b):
    """Full 32x32 -> 64-bit product; returns (lo, hi) uint32 words.

    Decomposes into 16-bit halves so every partial product and every
    accumulation stays strictly inside uint32:
      al*bl <= (2^16-1)^2 < 2^32
      t = (ll>>16) + (lh & 0xFFFF) + (hl & 0xFFFF) <= 3*(2^16-1) < 2^32
      hi = hh + (lh>>16) + (hl>>16) + (t>>16) < 2^32  (since a*b < 2^64)
    """
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    al = a & MASK16
    ah = a >> 16
    bl = b & MASK16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    t = (ll >> 16) + (lh & MASK16) + (hl & MASK16)
    lo = (ll & MASK16) | ((t & MASK16) << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (t >> 16)
    return lo, hi


def adc(a, b, carry_in):
    """a + b + carry_in (carry_in in {0..2}); returns (sum, carry_out).

    carry_out counts the number of 2^32 wraps (0, 1, or 2 — 2 only when
    carry_in itself causes a second wrap, which cannot happen for
    carry_in <= 1 + single add; we still compute it soundly)."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    s = a + b
    c1 = (s < a).astype(jnp.uint32)
    s2 = s + carry_in.astype(jnp.uint32)
    c2 = (s2 < s).astype(jnp.uint32)
    return s2, c1 + c2


def sbb(a, b, borrow_in):
    """a - b - borrow_in; returns (diff, borrow_out in {0,1})."""
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    d = a - b
    b1 = (a < b).astype(jnp.uint32)
    d2 = d - borrow_in.astype(jnp.uint32)
    b2 = (d < borrow_in.astype(jnp.uint32)).astype(jnp.uint32)
    return d2, b1 | b2


def add64(alo, ahi, blo, bhi):
    """(alo,ahi) + (blo,bhi) mod 2^64; returns (lo, hi, carry_out)."""
    lo = alo + blo
    c = (lo < alo).astype(jnp.uint32)
    hi = ahi + bhi
    c1 = (hi < ahi).astype(jnp.uint32)
    hi2 = hi + c
    c2 = (hi2 < hi).astype(jnp.uint32)
    return lo, hi2, c1 | c2


def sub64(alo, ahi, blo, bhi):
    """(alo,ahi) - (blo,bhi) mod 2^64; returns (lo, hi, borrow_out)."""
    lo = alo - blo
    b0 = (alo < blo).astype(jnp.uint32)
    hi = ahi - bhi
    b1 = (ahi < bhi).astype(jnp.uint32)
    hi2 = hi - b0
    b2 = (hi < b0).astype(jnp.uint32)
    return lo, hi2, b1 | b2


def mul64(alo, ahi, blo, bhi):
    """Full 64x64 -> 128-bit product of (lo,hi) uint32 pairs.

    Returns four uint32 words (r0, r1, r2, r3), little-endian."""
    l0, h0 = mulhilo32(alo, blo)
    l1, h1 = mulhilo32(alo, bhi)
    l2, h2 = mulhilo32(ahi, blo)
    l3, h3 = mulhilo32(ahi, bhi)
    r0 = l0
    # r1 = h0 + l1 + l2 with carries into r2
    s, ca = adc(h0, l1, jnp.uint32(0))
    r1, cb = adc(s, l2, jnp.uint32(0))
    carry_r2 = ca + cb
    # r2 = h1 + h2 + l3 + carry_r2 with carries into r3
    t, da = adc(h1, h2, jnp.uint32(0))
    t2, db = adc(t, l3, carry_r2)
    r2 = t2
    carry_r3 = da + db
    # r3 cannot wrap: the true product is < 2^128
    r3 = h3 + carry_r3
    return r0, r1, r2, r3


def geq64(alo, ahi, blo, bhi):
    """(alo,ahi) >= (blo,bhi) as bool array."""
    return (ahi > bhi) | ((ahi == bhi) & (alo >= blo))
