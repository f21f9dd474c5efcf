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


def _point_madd_kernel(L, q_tuple, n0, ax, ay, az, bx, by, ox, oy, oz, bad):
    """UNSAFE mixed add (madd-2007-bl, Z2 = 1): 7M + 4S vs the complete
    kernel's ~34 muls.  Skips the doubling / infinity branches entirely;
    instead emits a `bad` plane (1 where H == 0 or Z1 == 0, i.e. P == ±Q
    or acc-at-infinity) so the caller can mask discarded slots and fall
    back to the complete path on a genuine collision.  This is the MSM
    phase-1 workhorse: the accumulator is Jacobian, the incoming sorted
    point is affine (z implicitly 1)."""
    mul, add, sub, dbl, is_zero, sel = _field_ops(L, q_tuple, n0)
    X1 = [ax[i] for i in range(L)]
    Y1 = [ay[i] for i in range(L)]
    Z1 = [az[i] for i in range(L)]
    X2 = [bx[i] for i in range(L)]
    Y2 = [by[i] for i in range(L)]

    z1z1 = mul(Z1, Z1)
    u2 = mul(X2, z1z1)
    s2 = mul(Y2, mul(Z1, z1z1))
    h = sub(u2, X1)
    hh = mul(h, h)
    i_ = dbl(dbl(hh))
    j_ = mul(h, i_)
    r = dbl(sub(s2, Y1))
    v = mul(X1, i_)
    x3 = sub(sub(mul(r, r), j_), dbl(v))
    y3 = sub(mul(r, sub(v, x3)), dbl(mul(Y1, j_)))
    z3 = sub(sub(mul(add(Z1, h), add(Z1, h)), z1z1), hh)

    for i in range(L):
        ox[i] = x3[i]
        oy[i] = y3[i]
        oz[i] = z3[i]
    bad[0] = (is_zero(h) | is_zero(Z1)).astype(jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("L", "n0", "q_tuple", "rows", "interpret")
)
def _point_madd_call(ax, ay, az, bx, by, L, n0, q_tuple, rows, interpret):
    total_rows = ax.shape[1]
    kernel = functools.partial(_point_madd_kernel, L, q_tuple, n0)
    grid = (total_rows // rows,)
    spec = pl.BlockSpec((L, rows, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, rows, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, total_rows, 128), jnp.uint32)
    bshape = jax.ShapeDtypeStruct((1, total_rows, 128), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape, bshape),
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=(spec, spec, spec, bspec),
        interpret=interpret,
    )(ax, ay, az, bx, by)


def _scan_step_kernel(
    L, q_tuple, n0, one_tuple, ax, ay, az, bx, by, sf, fl, ox, oy, oz, bad
):
    """Fused MSM phase-1 scan step, entirely in VMEM:

        y2' = sign ? q - y2 : y2            (digit sign application)
        new = acc +_unsafe (x2, y2', 1)     (madd-2007-bl, 7M + 4S)
        out = flag ? (x2, y2', one) : new   (segment restart injection)
        bad = (H == 0 | Z1 == 0) & ~flag    (collision detector)

    Doing the sign/injection selects here (instead of XLA glue between
    pallas calls) saves ~100 MB of HBM round trips per scan step."""
    mul, add, sub, dbl, is_zero, sel = _field_ops(L, q_tuple, n0)
    X1 = [ax[i] for i in range(L)]
    Y1 = [ay[i] for i in range(L)]
    Z1 = [az[i] for i in range(L)]
    X2 = [bx[i] for i in range(L)]
    Y2 = [by[i] for i in range(L)]
    sgn = sf[0] != 0
    f = fl[0] != 0

    # y2' = q - y2 where sign (y2 < q and y2 != 0 for curve points)
    neg = []
    borrow = jnp.zeros_like(Y2[0])
    for i in range(L):
        d = int(q_tuple[i]) - Y2[i] - borrow
        borrow = (d >> 31) & 1
        neg.append(d & MASK16)
    Y2 = sel(sgn, neg, Y2)

    z1z1 = mul(Z1, Z1)
    u2 = mul(X2, z1z1)
    s2 = mul(Y2, mul(Z1, z1z1))
    h = sub(u2, X1)
    hh = mul(h, h)
    i_ = dbl(dbl(hh))
    j_ = mul(h, i_)
    r = dbl(sub(s2, Y1))
    v = mul(X1, i_)
    x3 = sub(sub(mul(r, r), j_), dbl(v))
    y3 = sub(mul(r, sub(v, x3)), dbl(mul(Y1, j_)))
    z3 = sub(sub(mul(add(Z1, h), add(Z1, h)), z1z1), hh)

    one = [jnp.full_like(X2[0], int(one_tuple[i])) for i in range(L)]
    x3 = sel(f, X2, x3)
    y3 = sel(f, Y2, y3)
    z3 = sel(f, one, z3)
    for i in range(L):
        ox[i] = x3[i]
        oy[i] = y3[i]
        oz[i] = z3[i]
    bad[0] = ((is_zero(h) | is_zero(Z1)) & ~f).astype(jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("L", "n0", "q_tuple", "one_tuple", "rows", "interpret")
)
def _scan_step_call(ax, ay, az, bx, by, sf, fl, L, n0, q_tuple, one_tuple, rows, interpret):
    total_rows = ax.shape[1]
    kernel = functools.partial(_scan_step_kernel, L, q_tuple, n0, one_tuple)
    grid = (total_rows // rows,)
    spec = pl.BlockSpec((L, rows, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, rows, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, total_rows, 128), jnp.uint32)
    bshape = jax.ShapeDtypeStruct((1, total_rows, 128), jnp.uint32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape, bshape),
        grid=grid,
        in_specs=[spec] * 5 + [bspec, bspec],
        out_specs=(spec, spec, spec, bspec),
        interpret=interpret,
    )(ax, ay, az, bx, by, sf, fl)


def point_scan_step_pallas(
    ctx, acc, q_aff, sgn, flg, rows: int = 8, interpret: bool = False
):
    """One fused MSM scan step on (L, B) coordinate arrays.

    acc = (x, y, z) Jacobian, q_aff = (x, y) affine, sgn/flg (B,) uint32
    planes.  Returns (x3, y3, z3, bad)."""
    L = ctx.L
    coords = list(acc) + list(q_aff)
    n = coords[0].shape[1]
    lane_rows = max(1, -(-n // 128))
    rows = min(rows, 1 << max(0, (lane_rows - 1).bit_length()))
    pad = (-n) % (rows * 128)
    padded = []
    for c in coords + [sgn.reshape(1, -1), flg.reshape(1, -1)]:
        if pad:
            c = jnp.pad(c, ((0, 0), (0, pad)))
        m = c.shape[1]
        padded.append(c.reshape(c.shape[0], m // 128, 128))
    from .. import bigint

    one_limbs = bigint.limbs_from_int(ctx.R_mod, L)
    x3, y3, z3, bad = _scan_step_call(
        *padded, L=L, n0=ctx.nprime & 0xFFFF,
        q_tuple=tuple(int(x) for x in ctx.q_limbs_np),
        one_tuple=tuple(int(x) for x in one_limbs), rows=rows,
        interpret=interpret,
    )
    res = []
    for c in (x3, y3, z3):
        c = c.reshape(L, -1)
        res.append(c[:, :n] if pad else c)
    b = bad.reshape(-1)
    res.append(b[:n] if pad else b)
    return tuple(res)


def point_madd_pallas(ctx, p, q_aff, rows: int = 8, interpret: bool = False):
    """Unsafe mixed add on (L, B) coordinate arrays: p = (x, y, z) Jacobian,
    q_aff = (x, y) affine.  Returns (x3, y3, z3, bad) with bad a (B,)
    uint32 plane (1 = slot hit a case the fast formula cannot handle)."""
    L = ctx.L
    coords = list(p) + list(q_aff)
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
    x3, y3, z3, bad = _point_madd_call(
        *padded, L=L, n0=ctx.nprime & 0xFFFF,
        q_tuple=tuple(int(x) for x in ctx.q_limbs_np), rows=rows,
        interpret=interpret,
    )
    res = []
    for c in (x3, y3, z3):
        c = c.reshape(L, -1)
        res.append(c[:, :n] if pad else c)
    b = bad.reshape(-1)
    res.append(b[:n] if pad else b)
    return tuple(res)


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
