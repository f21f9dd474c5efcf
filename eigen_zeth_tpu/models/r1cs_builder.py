"""R1CS circuit builder — gadgets for verifying the wrap-profile STARK
(models/air_wrap.py) inside the Groth16 final proof (VERDICT r2 item 5).

Builds constraints AND the witness in one pass: every gadget both emits
R1CS rows and computes the concrete wire values from the proof being
wrapped.  The emitted constraint STRUCTURE depends only on static shape
parameters (never on witness values), so a circuit built from any valid
proof of a shape serves as the Groth16 setup circuit for every proof of
that shape — asserted by tests that build from two different proofs and
compare layouts.

Two value domains:

  * FrVal — native BN254-Fr wires.  Linear combinations are free
    (R1CS rows are linear); a multiply is ONE constraint.  Poseidon2-Fr
    (ops/poseidon_fr.py) costs ~492 constraints per permutation: S-box
    multiplies only, the matrices fold into the rows.

  * GLVal — a Goldilocks value embedded in Fr, carried as a linear
    expression plus a signed-magnitude BOUND.  Arithmetic is LAZY: adds
    and subtracts track bounds, multiplies emit one constraint and
    multiply bounds, and nothing is reduced until (a) a bound would
    overflow Fr's capacity, or (b) the protocol compares values — then a
    reduction witness (quotient + 64-bit remainder decomposition) pins
    the value mod p_GL.  Opened Merkle leaf values enter through the
    64-bit unpack decomposition, which doubles as their range proof.
    A Goldilocks-Poseidon approach would pay that reduction on every
    multiply (~131 constraints each; docs/RECURSION.md:137-150) — lazy
    evaluation pays it once per comparison.

Soundness of laziness: every GLVal invariant is |value| <= bound and
bound < R/2, so mod-R arithmetic on the wires coincides with integer
arithmetic, and the final reduction's integer identity
  e + Q0*p = q'*p + r,   q' range-checked, r < 2^64
determines e mod p uniquely.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

from ..ops import goldilocks as gl
from ..ops import poseidon_fr as pfr
from .groth16 import R1CS

FR = pfr.R
P = gl.P
HALF_FR = FR // 2


def _expr_add(a: Dict[int, int], b: Dict[int, int]) -> Dict[int, int]:
    out = dict(a)
    for v, c in b.items():
        nc = out.get(v, 0) + c
        if nc:
            out[v] = nc
        else:
            out.pop(v, None)
    return out


def _expr_scale(a: Dict[int, int], k: int) -> Dict[int, int]:
    if k == 0:
        return {}
    return {v: c * k for v, c in a.items()}


@dataclass
class FrVal:
    expr: Dict[int, int]  # var -> integer coeff (reduced mod FR at emit)
    value: int  # canonical Fr value


@dataclass
class GLVal:
    expr: Dict[int, int]
    value: int  # exact signed integer under the canonical witness
    bound: int  # |value| <= bound < FR/2


class Builder:
    """Emits R1CS constraints and the matching witness in one pass."""

    def __init__(self):
        self.witness: List[int] = [1]
        self.constraints: List[tuple] = []
        self.num_public = 0  # set by finalize / make_public

    # -- core ----------------------------------------------------------------

    def new_var(self, value: int) -> int:
        self.witness.append(int(value) % FR)
        return len(self.witness) - 1

    def _row(self, expr: Dict[int, int]) -> Dict[int, int]:
        return {v: c % FR for v, c in expr.items() if c % FR}

    def emit(self, a: Dict[int, int], b: Dict[int, int], c: Dict[int, int]):
        self.constraints.append((self._row(a), self._row(b), self._row(c)))

    def const_fr(self, v: int) -> FrVal:
        v = int(v) % FR
        return FrVal(expr={0: v} if v else {}, value=v)

    def witness_fr(self, value: int) -> FrVal:
        var = self.new_var(value)
        return FrVal(expr={var: 1}, value=int(value) % FR)

    # -- native Fr arithmetic --------------------------------------------------

    def fr_add(self, a: FrVal, b: FrVal) -> FrVal:
        return FrVal(_expr_add(a.expr, b.expr), (a.value + b.value) % FR)

    def fr_sub(self, a: FrVal, b: FrVal) -> FrVal:
        return FrVal(
            _expr_add(a.expr, _expr_scale(b.expr, -1)), (a.value - b.value) % FR
        )

    def fr_scale(self, a: FrVal, k: int) -> FrVal:
        return FrVal(_expr_scale(a.expr, int(k) % FR), a.value * int(k) % FR)

    def fr_mul(self, a: FrVal, b: FrVal) -> FrVal:
        if not a.expr or a.expr == {0: a.value}:  # constant
            return self.fr_scale(b, a.value)
        if not b.expr or b.expr == {0: b.value}:
            return self.fr_scale(a, b.value)
        w = self.new_var(a.value * b.value % FR)
        self.emit(a.expr, b.expr, {w: 1})
        return FrVal(expr={w: 1}, value=a.value * b.value % FR)

    def fr_assert_eq(self, a: FrVal, b: FrVal):
        assert a.value == b.value, "witness violates Fr equality"
        self.emit(_expr_add(a.expr, _expr_scale(b.expr, -1)), {0: 1}, {})

    def fr_bool(self, value: int) -> FrVal:
        """A witness bit with b·b = b."""
        assert value in (0, 1)
        b = self.witness_fr(value)
        self.emit(b.expr, b.expr, b.expr)
        return b

    def fr_select(self, bit: FrVal, a: FrVal, b: FrVal) -> FrVal:
        """bit ? a : b  —  b + bit·(a-b), one constraint."""
        return self.fr_add(b, self.fr_mul(bit, self.fr_sub(a, b)))

    # -- decompositions --------------------------------------------------------

    def bits_of(self, x: FrVal, n_bits: int) -> List[FrVal]:
        """x == sum b_i 2^i with b_i boolean; REQUIRES x.value < 2^n_bits
        and 2^n_bits <= FR (unique decomposition)."""
        assert 0 <= x.value < (1 << n_bits) <= FR
        bits = [self.fr_bool((x.value >> i) & 1) for i in range(n_bits)]
        acc: Dict[int, int] = {}
        for i, b in enumerate(bits):
            acc = _expr_add(acc, _expr_scale(b.expr, 1 << i))
        self.emit(_expr_add(acc, _expr_scale(x.expr, -1)), {0: 1}, {})
        return bits

    def bits_canonical_fr(self, x: FrVal) -> List[FrVal]:
        """Full 254-bit decomposition of a native Fr wire with a
        strict-less-than-R check, so the decomposition is UNIQUE (without
        it a prover could present x or x+R and pick between two derived
        challenges)."""
        n = 254
        assert 0 <= x.value < FR
        bits = [self.fr_bool((x.value >> i) & 1) for i in range(n)]
        acc: Dict[int, int] = {}
        for i, b in enumerate(bits):
            acc = _expr_add(acc, _expr_scale(b.expr, 1 << i))
        self.emit(_expr_add(acc, _expr_scale(x.expr, -1)), {0: 1}, {})
        self._assert_bits_lt_const(bits, FR)
        return bits

    def _assert_bits_lt_const(self, bits: List[FrVal], K: int):
        """sum b_i 2^i < K (MSB scan: eq-prefix chain)."""
        n = len(bits)
        eq = self.const_fr(1)  # prefix of x equals prefix of K so far
        lt = self.const_fr(0)
        for i in range(n - 1, -1, -1):
            k_i = (K >> i) & 1
            b = bits[i]
            if k_i:
                # x_i = 0 while equal so far -> strictly less
                lt = self.fr_add(lt, self.fr_mul(eq, self.fr_sub(self.const_fr(1), b)))
                eq = self.fr_mul(eq, b)
            else:
                eq = self.fr_mul(eq, self.fr_sub(self.const_fr(1), b))
        # strict: a full equal prefix means x == K, which is not allowed
        self.fr_assert_eq(lt, self.const_fr(1))

    # -- Goldilocks-in-Fr (lazy) ----------------------------------------------

    def gl_const(self, v: int) -> GLVal:
        v = int(v) % P
        return GLVal(expr={0: v} if v else {}, value=v, bound=v)

    def gl_from_bits64(self, x: FrVal) -> GLVal:
        """Range-proven 64-bit value (the opened-leaf entry point)."""
        self.bits_of(x, 64)
        return GLVal(expr=dict(x.expr), value=x.value, bound=(1 << 64) - 1)

    def gl_add(self, a: GLVal, b: GLVal) -> GLVal:
        v = GLVal(_expr_add(a.expr, b.expr), a.value + b.value, a.bound + b.bound)
        return self._maybe_reduce(v)

    def gl_sub(self, a: GLVal, b: GLVal) -> GLVal:
        v = GLVal(
            _expr_add(a.expr, _expr_scale(b.expr, -1)),
            a.value - b.value,
            a.bound + b.bound,
        )
        return self._maybe_reduce(v)

    def gl_scale(self, a: GLVal, k: int) -> GLVal:
        k = int(k) % P
        return self._maybe_reduce(
            GLVal(_expr_scale(a.expr, k), a.value * k, a.bound * k)
        )

    def gl_mul(self, a: GLVal, b: GLVal) -> GLVal:
        if not a.expr or list(a.expr) == [0]:
            return self.gl_scale(b, a.value % P)
        if not b.expr or list(b.expr) == [0]:
            return self.gl_scale(a, b.value % P)
        if a.bound * b.bound >= HALF_FR:
            if a.bound > b.bound:
                a = self.gl_reduce(a)
            else:
                b = self.gl_reduce(b)
            if a.bound * b.bound >= HALF_FR:
                a = self.gl_reduce(a)
                b = self.gl_reduce(b)
        w = self.new_var(a.value * b.value)
        self.emit(a.expr, b.expr, {w: 1})
        return GLVal(expr={w: 1}, value=a.value * b.value, bound=a.bound * b.bound)

    def _maybe_reduce(self, v: GLVal) -> GLVal:
        return self.gl_reduce(v) if v.bound >= HALF_FR else v

    def gl_reduce(self, a: GLVal) -> GLVal:
        """Canonical remainder r = a mod p with the integer identity
        a + Q0·p = q'·p + r,  q' in [0, 2·Q0], r in [0, 2^64)."""
        if a.bound < P and a.value >= 0:
            return a
        r = a.value % P
        q = (a.value - r) // P
        q0 = a.bound // P + 1
        q_shift = q + q0
        assert 0 <= q_shift <= 2 * q0
        qbits = max(1, (2 * q0).bit_length())
        r_fr = self.witness_fr(r)
        self.bits_of(r_fr, 64)
        q_fr = self.witness_fr(q_shift)
        self.bits_of(q_fr, qbits)
        # a + q0·p - q'·p - r == 0   (linear, integer identity fits Fr)
        lhs = _expr_add(a.expr, {0: q0 * P})
        lhs = _expr_add(lhs, _expr_scale(q_fr.expr, -P))
        lhs = _expr_add(lhs, _expr_scale(r_fr.expr, -1))
        self.emit(lhs, {0: 1}, {})
        return GLVal(expr=dict(r_fr.expr), value=r, bound=P - 1)

    def gl_assert_zero(self, a: GLVal):
        """a ≡ 0 (mod p)."""
        assert a.value % P == 0, "witness violates GL equality"
        q = a.value // P
        q0 = a.bound // P + 1
        q_shift = q + q0
        qbits = max(1, (2 * q0).bit_length())
        q_fr = self.witness_fr(q_shift)
        self.bits_of(q_fr, qbits)
        lhs = _expr_add(a.expr, {0: q0 * P})
        lhs = _expr_add(lhs, _expr_scale(q_fr.expr, -P))
        self.emit(lhs, {0: 1}, {})

    def gl_assert_eq(self, a: GLVal, b: GLVal):
        self.gl_assert_zero(
            GLVal(
                _expr_add(a.expr, _expr_scale(b.expr, -1)),
                a.value - b.value,
                a.bound + b.bound,
            )
        )

    def gl_inv(self, a: GLVal) -> GLVal:
        """Witness inverse: i·a ≡ 1 (mod p).  Nonzero by protocol."""
        av = a.value % P
        assert av != 0
        inv = gl.h_inv(av)
        i = GLVal(expr={self.new_var(inv): 1}, value=inv, bound=P - 1)
        prod = self.gl_mul(i, a)
        self.gl_assert_zero(
            GLVal(_expr_add(prod.expr, {0: -1}), prod.value - 1, prod.bound + 1)
        )
        return i

    def gl_to_fr(self, a: GLVal) -> FrVal:
        """A CANONICAL (reduced, non-negative) GL value as a native Fr wire."""
        a = self.gl_reduce(a)
        if a.value < 0:  # pragma: no cover - reduce returns canonical
            raise AssertionError
        return FrVal(expr=dict(a.expr), value=a.value % FR)

    # -- packing ----------------------------------------------------------------

    def unpack_gl(self, packed: FrVal, k: int) -> List[GLVal]:
        """One packed Fr wire -> k (<= 3) range-proven 64-bit GL values.
        The recomposition constraint IS the leaf range proof."""
        assert 1 <= k <= pfr.GL_PACK
        vals = []
        acc: Dict[int, int] = {}
        rem = packed.value
        for j in range(k):
            vj = rem & ((1 << 64) - 1)
            rem >>= 64
            fv = self.witness_fr(vj)
            self.bits_of(fv, 64)
            vals.append(GLVal(expr=dict(fv.expr), value=vj, bound=(1 << 64) - 1))
            acc = _expr_add(acc, _expr_scale(fv.expr, 1 << (64 * j)))
        assert rem == 0, "packed element exceeds k values"
        self.emit(_expr_add(acc, _expr_scale(packed.expr, -1)), {0: 1}, {})
        return vals

    def pack_gl(self, vals: List[GLVal]) -> FrVal:
        """Canonical GL values -> one packed Fr wire (linear)."""
        assert 1 <= len(vals) <= pfr.GL_PACK
        acc: Dict[int, int] = {}
        value = 0
        for j, v in enumerate(vals):
            v = self.gl_reduce(v)
            acc = _expr_add(acc, _expr_scale(v.expr, 1 << (64 * j)))
            value |= (v.value % P) << (64 * j)
        return FrVal(expr=acc, value=value % FR)

    # -- Poseidon2-Fr gadget ------------------------------------------------------

    def poseidon_fr_perm(self, state: List[FrVal]) -> List[FrVal]:
        assert len(state) == pfr.WIDTH
        rc = pfr.round_constants()
        mu = pfr.internal_diag()

        def sbox(x: FrVal) -> FrVal:
            x2 = self.fr_mul(x, x)
            x4 = self.fr_mul(x2, x2)
            return self.fr_mul(x4, x)

        def m4_block(x):
            t0 = self.fr_add(x[0], x[1])
            t1 = self.fr_add(x[2], x[3])
            t2 = self.fr_add(self.fr_scale(x[1], 2), t1)
            t3 = self.fr_add(self.fr_scale(x[3], 2), t0)
            t4 = self.fr_add(self.fr_scale(t1, 4), t3)
            t5 = self.fr_add(self.fr_scale(t0, 4), t2)
            return [self.fr_add(t3, t5), t5, self.fr_add(t2, t4), t4]

        def external(s):
            blocks = [m4_block(s[i : i + 4]) for i in range(0, pfr.WIDTH, 4)]
            sums = [
                self.fr_add(self.fr_add(blocks[0][j], blocks[1][j]), blocks[2][j])
                for j in range(4)
            ]
            return [
                self.fr_add(blocks[i // 4][i % 4], sums[i % 4])
                for i in range(pfr.WIDTH)
            ]

        def internal(s):
            tot = s[0]
            for i in range(1, pfr.WIDTH):
                tot = self.fr_add(tot, s[i])
            return [
                self.fr_add(tot, self.fr_scale(s[i], mu[i]))
                for i in range(pfr.WIDTH)
            ]

        s = external(state)
        for r in range(pfr.N_ROUNDS):
            if pfr._is_full_round(r):
                s = [self.fr_add(v, self.const_fr(rc[r][i])) for i, v in enumerate(s)]
                s = [sbox(v) for v in s]
                s = external(s)
            else:
                s = [self.fr_add(s[0], self.const_fr(rc[r][0]))] + s[1:]
                s = [sbox(s[0])] + s[1:]
                s = internal(s)
        return s

    def poseidon_fr_sponge(self, elements: List[FrVal], tag: str) -> FrVal:
        """Mirrors pfr.hash_elements_host."""
        s = [self.const_fr(0)] * pfr.WIDTH
        s[pfr.WIDTH - 1] = self.const_fr(
            (pfr._sha_to_fr("ezt-pfr-sponge/" + tag) + len(elements)) % FR
        )
        for i in range(0, len(elements), pfr.RATE):
            blk = elements[i : i + pfr.RATE]
            for j, v in enumerate(blk):
                s[j] = self.fr_add(s[j], v)
            s = self.poseidon_fr_perm(s)
        return s[0]

    def poseidon_fr_node(self, left: FrVal, right: FrVal) -> FrVal:
        """Mirrors pfr.hash_two_host."""
        s = [self.const_fr(0)] * pfr.WIDTH
        s[0], s[1] = left, right
        s[pfr.WIDTH - 1] = self.const_fr(pfr._sha_to_fr("ezt-pfr-sponge/node"))
        return self.poseidon_fr_perm(s)[0]

    def merkle_check(
        self,
        leaf_digest: FrVal,
        dir_bits: List[FrVal],
        path: List[FrVal],
        root: FrVal,
    ):
        """Fold a path to the root; dir_bits[k] = 1 means the current
        digest is the RIGHT child at level k (index bit k)."""
        assert len(dir_bits) == len(path)
        d = leaf_digest
        for b, sib in zip(dir_bits, path):
            left = self.fr_select(b, sib, d)
            right = self.fr_sub(self.fr_add(d, sib), left)  # linear complement
            d = self.poseidon_fr_node(left, right)
        self.fr_assert_eq(d, root)

    # -- finalize ------------------------------------------------------------------

    def finalize(self, public_vars: List[int]) -> tuple:
        """Reorder so publics occupy vars 1..k; returns (R1CS, witness).

        Public vars must have been allocated FIRST (vars 1..k) — the
        builder asserts rather than permuting."""
        for i, v in enumerate(public_vars):
            assert v == i + 1, "allocate public inputs before any gadget"
        r1cs = R1CS(
            num_vars=len(self.witness),
            num_public=len(public_vars),
            constraints=self.constraints,
        )
        return r1cs, list(self.witness)
