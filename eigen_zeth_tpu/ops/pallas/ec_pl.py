"""Pallas G1 point-add kernel — the whole Jacobian add in VMEM.

The MSM's Hillis-Steele scans apply the EC group op to multi-million-
element vectors; composed from XLA field ops, every add/sub/mul streams
all coordinate planes through HBM (and the jit trace carries ~4k
primitives per point_add, making lowering minutes-slow).  This kernel
computes the complete branchless Jacobian add (infinity / P==Q / P==-Q
handled by selects, same semantics as ops/bn254.point_add) for a tile of
point pairs entirely in VMEM: ~22 CIOS Montgomery multiplies plus the
add/sub/compare chains, one HBM pass for 6 input and 3 output planes.

Layout: coordinates are (L, R, 128) uint32 — limb-major with native
(rows, 128) tiles per limb (cross-sublane relayouts killed the 2-D
version).  Infinity is z == 0, as everywhere else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK16 = 0xFFFF


def _field_ops(L: int, q_tuple, n0: int):
    """In-kernel field helpers over lists of L 2-D limb planes."""

    def mont_mul(a, b):
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
            m = (t[0] * n0) & MASK16
            tmp = t[0] + m * int(q_tuple[0])
            c = tmp >> 16
            for j in range(1, L):
                tmp = t[j] + m * int(q_tuple[j]) + c
                t[j - 1] = tmp & MASK16
                c = tmp >> 16
            tmp = t[L] + c
            t[L - 1] = tmp & MASK16
            t[L] = t[L + 1] + (tmp >> 16)
            t[L + 1] = zero
        return _cond_sub_q(t[:L], t[L])

    def _geq_q(t):
        gt = jnp.zeros_like(t[0], dtype=jnp.bool_)
        eq = jnp.ones_like(t[0], dtype=jnp.bool_)
        for i in range(L - 1, -1, -1):
            qi = int(q_tuple[i])
            gt = gt | (eq & (t[i] > qi))
            eq = eq & (t[i] == qi)
        return gt | eq

    def _cond_sub_q(t, extra):
        ge = _geq_q(t) | (extra > 0)
        out = []
        borrow = jnp.zeros_like(t[0])
        for i in range(L):
            d = t[i] - int(q_tuple[i]) - borrow
            borrow = (d >> 31) & 1
            out.append(jnp.where(ge, d & MASK16, t[i]))
        return out

    def add(a, b):
        out = []
        carry = jnp.zeros_like(a[0])
        for i in range(L):
            s = a[i] + b[i] + carry
            out.append(s & MASK16)
            carry = s >> 16
        return _cond_sub_q(out, carry)

    def sub(a, b):
        # a - b, adding q back on borrow
        d = []
        borrow = jnp.zeros_like(a[0])
        for i in range(L):
            x = a[i] - b[i] - borrow
            borrow = (x >> 31) & 1
            d.append(x & MASK16)
        lt = borrow > 0
        out = []
        carry = jnp.zeros_like(a[0])
        for i in range(L):
            s = d[i] + int(q_tuple[i]) + carry
            out.append(jnp.where(lt, s & MASK16, d[i]))
            carry = jnp.where(lt, s >> 16, jnp.zeros_like(s))
        return out

    def dbl(a):
        return add(a, a)

    def is_zero(a):
        z = a[0] == 0
        for i in range(1, L):
            z = z & (a[i] == 0)
        return z

    def sel(pred, a, b):
        return [jnp.where(pred, x, y) for x, y in zip(a, b)]

    return mont_mul, add, sub, dbl, is_zero, sel


def _point_add_kernel(L, q_tuple, n0, ax, ay, az, bx, by, bz, ox, oy, oz):
    mul, add, sub, dbl, is_zero, sel = _field_ops(L, q_tuple, n0)
    X1 = [ax[i] for i in range(L)]
    Y1 = [ay[i] for i in range(L)]
    Z1 = [az[i] for i in range(L)]
    X2 = [bx[i] for i in range(L)]
    Y2 = [by[i] for i in range(L)]
    Z2 = [bz[i] for i in range(L)]

    z1z1 = mul(Z1, Z1)
    z2z2 = mul(Z2, Z2)
    u1 = mul(X1, z2z2)
    u2 = mul(X2, z1z1)
    s1 = mul(mul(Y1, Z2), z2z2)
    s2 = mul(mul(Y2, Z1), z1z1)
    h = sub(u2, u1)
    rr = sub(s2, s1)

    h_zero = is_zero(h)
    r_zero = is_zero(rr)
    p_inf = is_zero(Z1)
    q_inf = is_zero(Z2)

    # generic add
    i_ = mul(dbl(h), dbl(h))
    j_ = mul(h, i_)
    r2 = dbl(rr)
    v = mul(u1, i_)
    x3 = sub(sub(mul(r2, r2), j_), dbl(v))
    y3 = sub(mul(r2, sub(v, x3)), dbl(mul(s1, j_)))
    zz = mul(Z1, Z2)  # ((Z1+Z2)^2 - z1z1 - z2z2)/2 = Z1·Z2; use direct product
    z3 = mul(dbl(zz), h)

    # doubling path (a = 0)
    A = mul(X1, X1)
    B = mul(Y1, Y1)
    C = mul(B, B)
    t = mul(add(X1, B), add(X1, B))
    D = dbl(sub(sub(t, A), C))
    E = add(dbl(A), A)
    F = mul(E, E)
    xd = sub(F, dbl(D))
    c8 = dbl(dbl(dbl(C)))
    yd = sub(mul(E, sub(D, xd)), c8)
    zd = dbl(mul(Y1, Z1))

    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    make_inf = h_zero & ~r_zero & ~p_inf & ~q_inf

    X3 = sel(use_dbl, xd, x3)
    Y3 = sel(use_dbl, yd, y3)
    Z3 = sel(use_dbl, zd, z3)
    zero = [jnp.zeros_like(X3[0])] * L
    Z3 = sel(make_inf, zero, Z3)
    X3 = sel(p_inf, X2, X3)
    Y3 = sel(p_inf, Y2, Y3)
    Z3 = sel(p_inf, Z2, Z3)
    q_only = q_inf & ~p_inf
    X3 = sel(q_only, X1, X3)
    Y3 = sel(q_only, Y1, Y3)
    Z3 = sel(q_only, Z1, Z3)

    for i in range(L):
        ox[i] = X3[i]
        oy[i] = Y3[i]
        oz[i] = Z3[i]


@functools.partial(
    jax.jit, static_argnames=("L", "n0", "q_tuple", "rows", "interpret")
)
def _point_add_call(ax, ay, az, bx, by, bz, L, n0, q_tuple, rows, interpret):
    total_rows = ax.shape[1]
    kernel = functools.partial(_point_add_kernel, L, q_tuple, n0)
    grid = (total_rows // rows,)
    spec = pl.BlockSpec((L, rows, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, total_rows, 128), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[spec] * 6,
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(ax, ay, az, bx, by, bz)


def point_add_pallas(ctx, p, q, rows: int = 8, interpret: bool = False):
    """Complete G1 Jacobian add on (L, B)-shaped coordinate arrays.

    p, q: PointJ-like tuples (x, y, z); returns (x3, y3, z3)."""
    L = ctx.L
    coords = list(p) + list(q)
    n = coords[0].shape[1]
    lane_rows = max(1, -(-n // 128))
    rows = min(rows, 1 << max(0, (lane_rows - 1).bit_length()))
    pad = (-n) % (rows * 128)
    padded = []
    for c in coords:
        assert c.ndim == 2
        if pad:
            c = jnp.pad(c, ((0, 0), (0, pad)))
        m = c.shape[1]
        padded.append(c.reshape(L, m // 128, 128))
    out = _point_add_call(
        *padded, L=L, n0=ctx.nprime & 0xFFFF,
        q_tuple=tuple(int(x) for x in ctx.q_limbs_np), rows=rows,
        interpret=interpret,
    )
    res = []
    for c in out:
        c = c.reshape(L, -1)
        res.append(c[:, :n] if pad else c)
    return tuple(res)
