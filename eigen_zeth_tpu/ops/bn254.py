"""BN254 (alt_bn128) curve arithmetic — the Groth16/KZG engine.

The reference's final proofs are Groth16 over "BN128" (proof/proof.json:
curve "BN128"; parsed by src/settlement/ethereum/mod.rs:445-481).  This
module provides the TPU-side curve arithmetic those proofs are computed
with:

  * Fq / Fr via the 16-limb Montgomery engine in ops/bigint.py
  * Fq2 = Fq[u]/(u^2+1) built field-generically on top
  * Jacobian point add/double written once against a small field-ops
    interface, so G1 (Fq) and G2 (Fq2) share the exact same formulas —
    branchless (infinity / P==Q / P==-Q handled by selects), so the
    whole thing jits and runs inside scans/collectives
  * host-side (python bigint, affine) reference implementation used by
    tests and by the Groth16 verifier

Point representation: PointJ(x, y, z) where each coordinate is a field
element pytree ((L, ...) array for Fq, pair of arrays for Fq2); infinity
is z == 0.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp

from .bigint import MontCtx, mont_ctx

# Curve order and base field (standard BN254 / alt_bn128 parameters).
Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
B_G1 = 3

G1_GEN = (1, 2)

# G2 generator, coordinates in Fq2 as (c0, c1) with x = c0 + c1*u.
G2_GEN_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_GEN_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)

# b2 = 3 / (9 + u) in Fq2
_NINE_U_INV = pow(9 * 9 + 1, Q - 2, Q)  # 1/(81+1) — see b2 derivation below
# (9+u)^{-1} = (9-u)/(81+1)
B_G2 = (
    (3 * 9 * _NINE_U_INV) % Q,
    (-3 * _NINE_U_INV) % Q,
)


def fq() -> MontCtx:
    return mont_ctx(Q)


def fr() -> MontCtx:
    return mont_ctx(R)


# ---------------------------------------------------------------------------
# field-ops adapters: uniform interface over Fq and Fq2 element pytrees


class FqOps:
    """Fq elements: (16, ...) uint32 arrays in Montgomery form."""

    def __init__(self):
        self.ctx = fq()

    def add(self, a, b):
        return self.ctx.add(a, b)

    def sub(self, a, b):
        return self.ctx.sub(a, b)

    def neg(self, a):
        return self.ctx.neg(a)

    def mul(self, a, b):
        return self.ctx.mont_mul(a, b)

    def sq(self, a):
        return self.ctx.mont_sq(a)

    def is_zero(self, a):
        return self.ctx.is_zero(a)

    def eq(self, a, b):
        return self.ctx.eq(a, b)

    def select(self, pred, a, b):
        return jnp.where(pred, a, b)

    def zero_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return self.ctx.one_mont(a.shape[1:])

    def inv(self, a):
        return self.ctx.inv(a)

    def double(self, a):
        return self.ctx.add(a, a)

    def from_int(self, v, shape=()):
        return self.ctx.const_mont(v, shape)

    def to_int(self, a):
        return self.ctx.to_int(a)


class Fq2Ops:
    """Fq2 = Fq[u]/(u^2 + 1); elements are (c0, c1) pairs of Fq arrays."""

    def __init__(self):
        self.fq = FqOps()

    def add(self, a, b):
        return (self.fq.add(a[0], b[0]), self.fq.add(a[1], b[1]))

    def sub(self, a, b):
        return (self.fq.sub(a[0], b[0]), self.fq.sub(a[1], b[1]))

    def neg(self, a):
        return (self.fq.neg(a[0]), self.fq.neg(a[1]))

    def mul(self, a, b):
        # Karatsuba: (a0+a1 u)(b0+b1 u) = (a0b0 - a1b1) + ((a0+a1)(b0+b1) - a0b0 - a1b1) u
        t0 = self.fq.mul(a[0], b[0])
        t1 = self.fq.mul(a[1], b[1])
        t2 = self.fq.mul(self.fq.add(a[0], a[1]), self.fq.add(b[0], b[1]))
        return (self.fq.sub(t0, t1), self.fq.sub(t2, self.fq.add(t0, t1)))

    def sq(self, a):
        # (a0+a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
        t0 = self.fq.mul(self.fq.add(a[0], a[1]), self.fq.sub(a[0], a[1]))
        t1 = self.fq.mul(a[0], a[1])
        return (t0, self.fq.add(t1, t1))

    def is_zero(self, a):
        return self.fq.is_zero(a[0]) & self.fq.is_zero(a[1])

    def eq(self, a, b):
        return self.fq.eq(a[0], b[0]) & self.fq.eq(a[1], b[1])

    def select(self, pred, a, b):
        return (
            self.fq.select(pred, a[0], b[0]),
            self.fq.select(pred, a[1], b[1]),
        )

    def zero_like(self, a):
        return (self.fq.zero_like(a[0]), self.fq.zero_like(a[1]))

    def one_like(self, a):
        return (self.fq.one_like(a[0]), self.fq.zero_like(a[1]))

    def inv(self, a):
        # 1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2)
        norm = self.fq.add(self.fq.sq(a[0]), self.fq.sq(a[1]))
        ninv = self.fq.inv(norm)
        return (self.fq.mul(a[0], ninv), self.fq.neg(self.fq.mul(a[1], ninv)))

    def double(self, a):
        return (self.fq.double(a[0]), self.fq.double(a[1]))

    def from_int(self, v, shape=()):
        c0, c1 = v if isinstance(v, tuple) else (v, 0)
        return (self.fq.from_int(c0, shape), self.fq.from_int(c1, shape))

    def to_int(self, a):
        return (self.fq.to_int(a[0]), self.fq.to_int(a[1]))


# ---------------------------------------------------------------------------
# Jacobian point ops, generic over the field


class PointJ(NamedTuple):
    x: Any
    y: Any
    z: Any


def point_double(F, p: PointJ) -> PointJ:
    """dbl-2009-l for a = 0 curves."""
    A = F.sq(p.x)
    B = F.sq(p.y)
    C = F.sq(B)
    t = F.sq(F.add(p.x, B))
    D = F.double(F.sub(F.sub(t, A), C))
    E = F.add(F.add(A, A), A)
    FF = F.sq(E)
    X3 = F.sub(FF, F.double(D))
    C8 = F.double(F.double(F.double(C)))
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
    Z3 = F.double(F.mul(p.y, p.z))
    return PointJ(X3, Y3, Z3)


def point_add(F, p: PointJ, q: PointJ) -> PointJ:
    """Complete Jacobian add (branchless): handles inf, P==Q, P==-Q."""
    z1z1 = F.sq(p.z)
    z2z2 = F.sq(q.z)
    u1 = F.mul(p.x, z2z2)
    u2 = F.mul(q.x, z1z1)
    s1 = F.mul(F.mul(p.y, q.z), z2z2)
    s2 = F.mul(F.mul(q.y, p.z), z1z1)
    h = F.sub(u2, u1)
    rr = F.sub(s2, s1)

    h_zero = F.is_zero(h)
    r_zero = F.is_zero(rr)
    p_inf = F.is_zero(p.z)
    q_inf = F.is_zero(q.z)

    # generic add path
    i = F.sq(F.double(h))
    j = F.mul(h, i)
    r2 = F.double(rr)
    v = F.mul(u1, i)
    x3 = F.sub(F.sub(F.sq(r2), j), F.double(v))
    y3 = F.sub(F.mul(r2, F.sub(v, x3)), F.double(F.mul(s1, j)))
    z3 = F.mul(
        F.sub(F.sub(F.sq(F.add(p.z, q.z)), z1z1), z2z2),
        h,
    )
    added = PointJ(x3, y3, z3)

    doubled = point_double(F, p)

    # P == Q (same affine point): h == 0 and r == 0 -> double
    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    # P == -Q: h == 0, r != 0 -> infinity (z = 0)
    make_inf = h_zero & ~r_zero & ~p_inf & ~q_inf

    out = PointJ(
        F.select(use_dbl, doubled.x, added.x),
        F.select(use_dbl, doubled.y, added.y),
        F.select(use_dbl, doubled.z, added.z),
    )
    out = PointJ(
        out.x, out.y, F.select(make_inf, F.zero_like(out.z), out.z)
    )
    # infinities: inf + Q = Q, P + inf = P
    out = PointJ(
        F.select(p_inf, q.x, out.x),
        F.select(p_inf, q.y, out.y),
        F.select(p_inf, q.z, out.z),
    )
    out = PointJ(
        F.select(q_inf & ~p_inf, p.x, out.x),
        F.select(q_inf & ~p_inf, p.y, out.y),
        F.select(q_inf & ~p_inf, p.z, out.z),
    )
    return out


def point_madd_unsafe(F, p: PointJ, qx, qy):
    """UNSAFE mixed add p + (qx, qy, 1) — madd-2007-bl, 7M + 4S.

    No doubling or infinity branches: returns garbage (flagged via `bad`)
    when H == 0 (P == ±Q) or p is at infinity.  The MSM's phase-1 scan
    masks bad slots it discards anyway and falls back to the complete
    kernel on a real collision.  Mirrors the pallas kernel in
    ops/pallas/ec_pl.py::_point_madd_kernel bit for bit."""
    z1z1 = F.sq(p.z)
    u2 = F.mul(qx, z1z1)
    s2 = F.mul(qy, F.mul(p.z, z1z1))
    h = F.sub(u2, p.x)
    hh = F.sq(h)
    i_ = F.double(F.double(hh))
    j_ = F.mul(h, i_)
    r = F.double(F.sub(s2, p.y))
    v = F.mul(p.x, i_)
    x3 = F.sub(F.sub(F.sq(r), j_), F.double(v))
    y3 = F.sub(F.mul(r, F.sub(v, x3)), F.double(F.mul(p.y, j_)))
    z3 = F.sub(F.sub(F.sq(F.add(p.z, h)), z1z1), hh)
    bad = F.is_zero(h) | F.is_zero(p.z)
    return PointJ(x3, y3, z3), bad


def point_neg(F, p: PointJ) -> PointJ:
    return PointJ(p.x, F.neg(p.y), p.z)


def point_inf_like(F, p: PointJ) -> PointJ:
    return PointJ(p.x, p.y, F.zero_like(p.z))


def to_affine(F, p: PointJ):
    """Jacobian -> affine (x/z^2, y/z^3); infinity -> (0, 0)."""
    zinv = F.inv(p.z)
    zinv2 = F.sq(zinv)
    zinv3 = F.mul(zinv2, zinv)
    ax = F.mul(p.x, zinv2)
    ay = F.mul(p.y, zinv3)
    inf = F.is_zero(p.z)
    return (
        F.select(inf, F.zero_like(ax), ax),
        F.select(inf, F.zero_like(ay), ay),
    )


def from_affine(F, x, y, is_inf=None) -> PointJ:
    one = F.one_like(x)
    z = one
    if is_inf is not None:
        z = F.select(is_inf, F.zero_like(one), one)
    return PointJ(x, y, z)


# ---------------------------------------------------------------------------
# host reference: affine python-bigint arithmetic (tests + verifier)


def h_fq2_mul(a, b):
    return (
        (a[0] * b[0] - a[1] * b[1]) % Q,
        (a[0] * b[1] + a[1] * b[0]) % Q,
    )


def h_fq2_inv(a):
    norm_inv = pow((a[0] * a[0] + a[1] * a[1]) % Q, Q - 2, Q)
    return ((a[0] * norm_inv) % Q, (-a[1] * norm_inv) % Q)


class _HostFq:
    def add(self, a, b):
        return (a + b) % Q

    def sub(self, a, b):
        return (a - b) % Q

    def mul(self, a, b):
        return (a * b) % Q

    def inv(self, a):
        return pow(a, Q - 2, Q)

    def zero(self):
        return 0

    def is_zero(self, a):
        return a == 0

    def neg(self, a):
        return (-a) % Q


class _HostFq2:
    def add(self, a, b):
        return ((a[0] + b[0]) % Q, (a[1] + b[1]) % Q)

    def sub(self, a, b):
        return ((a[0] - b[0]) % Q, (a[1] - b[1]) % Q)

    def mul(self, a, b):
        return h_fq2_mul(a, b)

    def inv(self, a):
        return h_fq2_inv(a)

    def zero(self):
        return (0, 0)

    def is_zero(self, a):
        return a == (0, 0)

    def neg(self, a):
        return ((-a[0]) % Q, (-a[1]) % Q)


HOST_FQ = _HostFq()
HOST_FQ2 = _HostFq2()


def h_ec_add(p, q, F=HOST_FQ):
    """Affine add; points are (x, y) or None for infinity."""
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    if x1 == x2:
        if F.is_zero(F.add(y1, y2)):
            return None
        # double
        if F is HOST_FQ:
            lam = F.mul(F.mul(F.mul(x1, x1), 3), F.inv(F.mul(y1, 2)))
        else:
            three_x2 = F.mul(F.mul(x1, x1), (3, 0))
            lam = F.mul(three_x2, F.inv(F.add(y1, y1)))
        x3 = F.sub(F.sub(F.mul(lam, lam), x1), x2)
        y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
        return (x3, y3)
    lam = F.mul(F.sub(y2, y1), F.inv(F.sub(x2, x1)))
    x3 = F.sub(F.sub(F.mul(lam, lam), x1), x2)
    y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
    return (x3, y3)


def h_ec_mul(k: int, p, F=HOST_FQ):
    """Affine scalar multiply (double-and-add)."""
    acc = None
    add = p
    while k:
        if k & 1:
            acc = h_ec_add(acc, add, F)
        add = h_ec_add(add, add, F)
        k >>= 1
    return acc


def h_ec_mul_jac(k: int, p):
    """G1 scalar multiply in Jacobian coordinates — ONE field inversion
    total instead of one per bit (h_ec_mul's affine ladder pays a 254-bit
    modexp per step; this is the bulk path for test/bench point sets)."""
    if p is None or k % R == 0:
        return None
    k %= R
    x2, y2 = p  # affine base (Z=1) for mixed additions
    X1 = Y1 = Z1 = None  # infinity

    def dbl(X, Y, Z):
        A = X * X % Q
        B = Y * Y % Q
        C = B * B % Q
        D = 2 * ((X + B) * (X + B) - A - C) % Q
        E = 3 * A % Q
        F_ = E * E % Q
        X3 = (F_ - 2 * D) % Q
        Y3 = (E * (D - X3) - 8 * C) % Q
        Z3 = 2 * Y * Z % Q
        return X3, Y3, Z3

    def madd(X, Y, Z):  # (X,Y,Z) + (x2,y2,1), Z != 0
        Z1Z1 = Z * Z % Q
        U2 = x2 * Z1Z1 % Q
        S2 = y2 * Z * Z1Z1 % Q
        H = (U2 - X) % Q
        r = (S2 - Y) % Q
        if H == 0:
            if r == 0:
                return dbl(X, Y, Z)
            return None  # infinity
        HH = H * H % Q
        HHH = H * HH % Q
        V = X * HH % Q
        X3 = (r * r - HHH - 2 * V) % Q
        Y3 = (r * (V - X3) - Y * HHH) % Q
        Z3 = Z * H % Q
        return X3, Y3, Z3

    for bit in bin(k)[2:]:
        if X1 is not None:
            X1, Y1, Z1 = dbl(X1, Y1, Z1)
        if bit == "1":
            if X1 is None:
                X1, Y1, Z1 = x2, y2, 1
            else:
                out = madd(X1, Y1, Z1)
                if out is None:
                    return None
                X1, Y1, Z1 = out
    if X1 is None:
        return None
    zi = pow(Z1, Q - 2, Q)
    zi2 = zi * zi % Q
    return (X1 * zi2 % Q, Y1 * zi2 * zi % Q)


def h_ec_mul_jac_f(k: int, p, F=HOST_FQ):
    """Field-generic Jacobian scalar multiply (G1 via HOST_FQ, G2 via
    HOST_FQ2) — one inversion total; h_ec_mul's affine ladder pays a
    field inversion per bit, which dominates CRS generation for
    1000+-variable circuits (models/groth16.setup)."""
    if p is None or k % R == 0:
        return None
    k %= R
    x2, y2 = p

    def dbl(X, Y, Z):
        A = F.mul(X, X)
        B = F.mul(Y, Y)
        C = F.mul(B, B)
        xb = F.add(X, B)
        D = F.sub(F.sub(F.mul(xb, xb), A), C)
        D = F.add(D, D)
        E = F.add(F.add(A, A), A)
        F_ = F.mul(E, E)
        X3 = F.sub(F_, F.add(D, D))
        C8 = F.add(C, C)
        C8 = F.add(C8, C8)
        C8 = F.add(C8, C8)
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
        Z3 = F.mul(F.add(Y, Y), Z)
        return X3, Y3, Z3

    def madd(X, Y, Z):  # + (x2, y2, 1)
        ZZ = F.mul(Z, Z)
        U2 = F.mul(x2, ZZ)
        S2 = F.mul(F.mul(y2, Z), ZZ)
        H = F.sub(U2, X)
        r = F.sub(S2, Y)
        if F.is_zero(H):
            if F.is_zero(r):
                return dbl(X, Y, Z)
            return None
        HH = F.mul(H, H)
        HHH = F.mul(H, HH)
        V = F.mul(X, HH)
        X3 = F.sub(F.sub(F.mul(r, r), HHH), F.add(V, V))
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.mul(Y, HHH))
        Z3 = F.mul(Z, H)
        return X3, Y3, Z3

    one = (1, 0) if F is HOST_FQ2 else 1
    acc = None
    for bit in bin(k)[2:]:
        if acc is not None:
            acc = dbl(*acc)
        if bit == "1":
            if acc is None:
                acc = (x2, y2, one)
            else:
                out = madd(*acc)
                if out is None:
                    return None
                acc = out
    if acc is None:
        return None
    X1, Y1, Z1 = acc
    zi = F.inv(Z1)
    zi2 = F.mul(zi, zi)
    return (F.mul(X1, zi2), F.mul(Y1, F.mul(zi2, zi)))


def h_on_curve_g1(p) -> bool:
    if p is None:
        return True
    x, y = p
    return (y * y - x * x * x - B_G1) % Q == 0


def h_on_curve_g2(p) -> bool:
    if p is None:
        return True
    x, y = p
    y2 = h_fq2_mul(y, y)
    x3 = h_fq2_mul(h_fq2_mul(x, x), x)
    return ((y2[0] - x3[0] - B_G2[0]) % Q, (y2[1] - x3[1] - B_G2[1]) % Q) == (0, 0)
