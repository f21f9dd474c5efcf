"""Multi-scalar multiplication (Pippenger) over BN254 — TPU-native design.

Replaces the MSM inside the reference's external eigen-prover
(BASELINE config 3: 2^18 points, sharded across chips with psum bucket
reduction; SURVEY.md §2.9-bis).  The classic GPU formulation scatters
points into 2^c buckets — data-dependent indexing that is hostile to a
dense-SIMD machine.  Here the scatter becomes sort + segmented scan:

  per window w (digits d_i = bits [cw, cw+c) of each scalar):
    1. argsort points by digit                       (dense, on-device)
    2. inclusive *segmented* Hillis-Steele scan with the EC group op —
       segment boundaries where the sorted digit changes; the scan's
       value at each segment end is that bucket's point sum
    3. one scatter of the ≤2^c segment-end sums into the bucket table
    4. bucket aggregation Σ b·B_b = Σ_{b≥1} suffix_b via a reverse scan
       plus a plain scan — no sequential 2^c-step loop
  window combine: Horner over windows (c doublings + 1 add per window).

Every scan is a lax.fori_loop whose body applies point_add ONCE to the
full vector (Hillis-Steele): on a SIMD machine each step costs one
full-width vector op regardless of masking, so log2(n) steps is optimal
step-count-wise, and the jit trace stays small (a handful of point_add
instantiations total, not O(windows·log n)).

Field-generic (FqOps / Fq2Ops): the same code computes G1 and G2 MSMs.
The multi-chip version (points partitioned per chip, psum-style bucket
reduction over the mesh) lives in parallel/msm_dist.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import bn254
from .bn254 import PointJ, from_affine, point_add, point_double, to_affine

DEFAULT_C = 8


def scalar_digits(scalars, c: int = DEFAULT_C, nbits: int = 254) -> np.ndarray:
    """Host: scalar ints -> (W, N) uint32 window digits, W = ceil(nbits/c)."""
    n_windows = (nbits + c - 1) // c
    out = np.zeros((n_windows, len(scalars)), dtype=np.uint32)
    mask = (1 << c) - 1
    for i, s in enumerate(scalars):
        s = int(s)
        for w in range(n_windows):
            out[w, i] = (s >> (c * w)) & mask
    return out


def _tmap(fn, *trees):
    return jax.tree_util.tree_map(fn, *trees)


def _fori(lo, hi, body, init, eager: bool):
    """lax.fori_loop, or a python loop when eager (CPU test path: avoids
    XLA compiles, which are prohibitively slow for EC graphs on CPU)."""
    if eager:
        val = init
        for i in range(lo, hi):
            val = body(i, val)
        return val
    return jax.lax.fori_loop(lo, hi, body, init)


def _point_select(F, pred, a: PointJ, b: PointJ) -> PointJ:
    return PointJ(
        F.select(pred, a.x, b.x), F.select(pred, a.y, b.y), F.select(pred, a.z, b.z)
    )


class ECGroup:
    """The EC group op as seen by the MSM machinery (elements: PointJ)."""

    def __init__(self, F):
        self.F = F
        self._is_g1 = isinstance(F, bn254.FqOps)

    def _pallas_ok(self, a: PointJ) -> bool:
        if not self._is_g1:
            return False
        from .bigint import _pallas_enabled

        leaf = a.x
        if not hasattr(leaf, "ndim") or leaf.ndim < 2:
            return False
        size = 1
        for d in leaf.shape[1:]:
            size *= d
        return size >= 512 and _pallas_enabled()

    def add(self, a, b):
        if self._pallas_ok(a):
            from ..ops.pallas.ec_pl import point_add_pallas
            from .bn254 import PointJ as PJ

            ctx = self.F.ctx
            batch = a.x.shape[1:]
            flat = lambda l: l.reshape(ctx.L, -1)
            x3, y3, z3 = point_add_pallas(
                ctx,
                (flat(a.x), flat(a.y), flat(a.z)),
                (flat(b.x), flat(b.y), flat(b.z)),
            )
            unflat = lambda l: l.reshape((ctx.L,) + batch)
            return PJ(unflat(x3), unflat(y3), unflat(z3))
        return point_add(self.F, a, b)

    def double(self, a):
        return point_double(self.F, a)

    def select(self, pred, a, b):
        return _point_select(self.F, pred, a, b)


class IntGroup:
    """Mock abelian group (uint32 with wraparound add; identity 0).

    Lets structural / multi-chip tests exercise the full sort + scan +
    scatter + reduce pipeline with trivial compile cost; Σ s_i·p_i is then
    checkable with plain numpy."""

    def add(self, a, b):
        return jax.tree_util.tree_map(lambda x, y: x + y, a, b)

    def double(self, a):
        return self.add(a, a)

    def select(self, pred, a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.where(pred, x, y), a, b
        )


def _hs_scan(G, pts, flags=None, reverse: bool = False, eager: bool = False):
    """Inclusive (optionally segmented) Hillis-Steele scan with the EC op
    along the last axis.  flags marks segment starts; None = one segment.

    One point_add in the trace; ceil(log2(n)) runtime steps."""
    n = jax.tree_util.tree_leaves(pts)[0].shape[-1]
    steps = max((n - 1).bit_length(), 0)
    if reverse:
        pts = _tmap(lambda l: jnp.flip(l, axis=-1), pts)
        assert flags is None
    nd = jax.tree_util.tree_leaves(pts)[0].ndim
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    have_flags = flags is not None
    if not have_flags:
        flags = jnp.zeros((1,) * (nd - 1) + (n,), dtype=bool)
    else:
        # left-pad the flag rank to the leaf rank so selects broadcast
        # without growing leaf shapes
        flags = flags.reshape((1,) * (nd - flags.ndim) + flags.shape)

    def body(d, carry):
        v, f = carry
        s = jnp.int32(1) << d
        sh_v = _tmap(lambda l: jnp.roll(l, s, axis=-1), v)
        sh_f = jnp.roll(f, s, axis=-1)
        valid = idx >= s  # (n,) broadcasts against trailing axis
        combined = G.add(sh_v, v)
        blocked = f if have_flags else jnp.zeros_like(f)
        take_comb = valid & ~blocked
        new_v = G.select(take_comb, combined, v)
        new_f = f | (valid & sh_f)
        return new_v, new_f

    out, _ = _fori(0, steps, body, (pts, flags), eager)
    if reverse:
        out = _tmap(lambda l: jnp.flip(l, axis=-1), out)
    return out


def _blocked_seg_scan(G, pts, flags, serial: int = 32):
    """O(N) two-phase segmented inclusive scan along the last axis.

    Hillis-Steele costs N·log2(N) group ops; this does ~2N:
      phase 1: view N as (C lanes x S serial); a lax.scan over S computes
               lane-local segmented running sums (one full-width group op
               per step, S steps)
      phase 2: lane tails combine across lanes with a small segmented
               scan (C elements); inflow for each lane is the combined
               tail of the connected preceding run
      phase 3: one masked full-width add folds the inflow into each
               lane's head run (positions before its first real flag)

    pts: leaves (..., N) with a leading element axis; flags: (..., N) with
    one less rank (broadcasts in selects).  True = segment start."""
    n = flags.shape[-1]
    S = serial
    while n % S:
        S //= 2
    C = n // S

    resh = lambda l: l.reshape(l.shape[:-1] + (C, S))
    pts_r = _tmap(resh, pts)
    flags_r = resh(flags)
    lane_start = flags_r.at[..., 0].set(True)

    # phase 1 — serial scan within lanes
    xs = _tmap(lambda l: jnp.moveaxis(l, -1, 0), pts_r)
    fx = jnp.moveaxis(lane_start, -1, 0)

    def step(acc, inp):
        val, f = inp
        new = G.select(f, val, G.add(acc, val))
        return new, new

    init = _tmap(lambda l: jnp.zeros_like(l[0]), xs)
    _, ys = jax.lax.scan(step, init, (xs, fx))
    scanned = _tmap(lambda l: jnp.moveaxis(l, 0, -1), ys)  # (..., C, S)

    # phase 2 — combine lane tails
    tails = _tmap(lambda l: l[..., -1], scanned)  # (..., C)
    has_flag = jnp.any(flags_r, axis=-1)  # (..., C)
    lane_scan = _hs_scan(G, tails, flags=has_flag)
    shifted = _tmap(lambda l: jnp.roll(l, 1, axis=-1), lane_scan)
    idx = jax.lax.broadcasted_iota(jnp.int32, (C,), 0)
    connected = (idx > 0) & ~flags_r[..., 0]  # lane start continues prev segment
    identity = _tmap(jnp.zeros_like, shifted)
    inflow = G.select(connected, shifted, identity)

    # phase 3 — add inflow to each lane's head run
    head = jnp.cumsum(flags_r.astype(jnp.int32), axis=-1) == 0  # (..., C, S)
    inflow_b = _tmap(
        lambda l: jnp.broadcast_to(l[..., None], l.shape + (S,)), inflow
    )
    fixed = G.select(head, G.add(scanned, inflow_b), scanned)
    return _tmap(lambda l: l.reshape(l.shape[:-2] + (n,)), fixed)


def _scan_total(G, pts, eager: bool = False):
    """Σ over the last axis = last element of an inclusive plain scan."""
    scanned = _hs_scan(G, pts, eager=eager)
    return _tmap(lambda l: l[..., -1], scanned)


def msm_window_sums(
    G,
    points,
    digits: jnp.ndarray,
    c: int = DEFAULT_C,
    window_group: int = 32,
    eager: bool = False,
):
    """Per-window bucket-aggregated sums S_w = Σ_b b·B_b; leaves (..., W)."""
    n_windows, n = digits.shape
    nbuckets = 1 << c

    window_sums = []
    for start in range(0, n_windows, window_group):
        d = digits[start : start + window_group]  # (g, N)
        g = d.shape[0]
        order = jnp.argsort(d, axis=-1)
        d_sorted = jnp.take_along_axis(d, order, axis=-1)
        pts = _tmap(lambda leaf: jnp.take(leaf, order, axis=-1), points)

        # segment starts: first element or digit change
        first = jnp.ones((g, 1), dtype=bool)
        flags = jnp.concatenate([first, d_sorted[:, 1:] != d_sorted[:, :-1]], axis=-1)
        scanned = _hs_scan(G, pts, flags=flags, eager=eager)

        # segment ends: last element or next flag set
        last = jnp.ones((g, 1), dtype=bool)
        ends = jnp.concatenate([flags[:, 1:], last], axis=-1)
        # scatter segment-end sums into buckets; non-ends -> dummy slot
        target = jnp.where(ends, d_sorted, jnp.uint32(nbuckets))
        g_idx = jnp.arange(g)[:, None]

        def scatter(leaf):
            shape = leaf.shape[:-2] + (g, nbuckets + 1)
            buckets = jnp.zeros(shape, dtype=leaf.dtype)
            return buckets.at[..., g_idx, target].set(leaf)

        buckets = _tmap(scatter, scanned)
        # drop dummy slot + bucket 0 (zero digit contributes nothing)
        buckets = _tmap(lambda l: l[..., 1:nbuckets], buckets)
        # S_w = Σ_{b>=1} b·B_b = Σ suffix-sums
        suffix = _hs_scan(G, buckets, reverse=True, eager=eager)
        window_sums.append(_scan_total(G, suffix, eager=eager))  # leaves (..., g)

    return _tmap(lambda *ls: jnp.concatenate(ls, axis=-1), *window_sums)  # (..., W)


def horner_windows(G, S, n_windows: int, c: int, eager: bool = False):
    """Combine per-window sums: Σ_w 2^(cw)·S_w (Horner from the top)."""

    def take_w(w):
        return _tmap(lambda l: jnp.take(l, w, axis=-1), S)

    def body(i, acc):
        acc = _fori(0, c, lambda _, a: G.double(a), acc, eager)
        return G.add(acc, take_w(n_windows - 2 - i))

    acc0 = take_w(n_windows - 1)
    return _fori(0, n_windows - 1, body, acc0, eager)


def msm(
    F,
    points: PointJ,
    digits: jnp.ndarray,
    c: int = DEFAULT_C,
    window_group: int = 32,
    eager: bool = False,
) -> PointJ:
    """MSM core: Σ_i s_i·P_i from precomputed window digits.

    points: PointJ with leaf shape (..., N) (Jacobian; z=0 marks infinity)
    digits: (W, N) uint32
    returns a single PointJ (batch shape ())."""
    G = ECGroup(F)
    S = msm_window_sums(G, points, digits, c, window_group, eager)
    return horner_windows(G, S, digits.shape[0], c, eager)


def _host_horner(windows, c: int, fq2: bool = False):
    """Host combine Σ_w 2^(cw)·S_w (python bigints; eager test path)."""
    Fh = bn254.HOST_FQ2 if fq2 else bn254.HOST_FQ
    acc = None
    for S_w in reversed(windows):
        for _ in range(c):
            acc = bn254.h_ec_add(acc, acc, Fh)
        acc = bn254.h_ec_add(acc, S_w, Fh)
    return acc


# ---------------------------------------------------------------------------
# convenience wrappers (host ints in / host ints out)


def _g1_device_points(points_int) -> PointJ:
    F = bn254.FqOps()
    xs = F.ctx.from_int([p[0] if p is not None else 0 for p in points_int])
    ys = F.ctx.from_int([p[1] if p is not None else 0 for p in points_int])
    inf = np.array([p is None for p in points_int])
    return from_affine(F, xs, ys, is_inf=jnp.asarray(inf))


def _g2_device_points(points_int) -> PointJ:
    F = bn254.Fq2Ops()
    x = (
        F.fq.ctx.from_int([p[0][0] if p is not None else 0 for p in points_int]),
        F.fq.ctx.from_int([p[0][1] if p is not None else 0 for p in points_int]),
    )
    y = (
        F.fq.ctx.from_int([p[1][0] if p is not None else 0 for p in points_int]),
        F.fq.ctx.from_int([p[1][1] if p is not None else 0 for p in points_int]),
    )
    inf = jnp.asarray(np.array([p is None for p in points_int]))
    return from_affine(F, x, y, is_inf=inf)


@functools.partial(jax.jit, static_argnums=(2,))
def _window_sums_jit_g1(points: PointJ, digits, c: int) -> PointJ:
    return msm_window_sums(ECGroup(bn254.FqOps()), points, digits, c=c)


@functools.partial(jax.jit, static_argnums=(2,))
def _window_sums_jit_g2(points: PointJ, digits, c: int) -> PointJ:
    return msm_window_sums(ECGroup(bn254.Fq2Ops()), points, digits, c=c)


@jax.jit
def _to_affine_jit_g1(S: PointJ):
    F = bn254.FqOps()
    ax, ay = to_affine(F, S)
    return ax, ay, F.is_zero(S.z)


@jax.jit
def _to_affine_jit_g2(S: PointJ):
    F = bn254.Fq2Ops()
    ax, ay = to_affine(F, S)
    return ax, ay, F.is_zero(S.z)


def msm_g1(points_int, scalars, c: int = DEFAULT_C, use_jit: bool = True):
    """Σ s_i·P_i on G1; host ints in, affine host ints out (None = inf).

    use_jit=False runs eagerly — used by the hermetic CPU test suite,
    where XLA CPU compile times for EC graphs are prohibitive; production
    (TPU) runs always jit."""
    F = bn254.FqOps()
    pts = _g1_device_points(points_int)
    digits = jnp.asarray(scalar_digits(scalars, c))
    # device window sums, host Horner combine (the device Horner is a
    # 2^c·W-step sequential tail of tiny kernels — host bigints win)
    if use_jit:
        S = _window_sums_jit_g1(pts, digits, c)
        ax, ay, inf = _to_affine_jit_g1(S)
        inf = np.asarray(inf)
    else:
        S = msm_window_sums(ECGroup(F), pts, digits, c=c, eager=True)
        ax, ay = to_affine(F, S)
        inf = np.asarray(F.is_zero(S.z))
    xs, ys = F.to_int(ax), F.to_int(ay)
    windows = [
        None if inf[w] else (int(xs[w]), int(ys[w])) for w in range(digits.shape[0])
    ]
    return _host_horner(windows, c)


def msm_g2(points_int, scalars, c: int = DEFAULT_C, use_jit: bool = True):
    """Σ s_i·P_i on G2; host int pairs in, affine ((x0,x1),(y0,y1)) out."""
    F = bn254.Fq2Ops()
    pts = _g2_device_points(points_int)
    digits = jnp.asarray(scalar_digits(scalars, c))
    if use_jit:
        S = _window_sums_jit_g2(pts, digits, c)
        ax, ay, inf = _to_affine_jit_g2(S)
        inf = np.asarray(inf)
    else:
        S = msm_window_sums(ECGroup(F), pts, digits, c=c, eager=True)
        ax, ay = to_affine(F, S)
        inf = np.asarray(F.is_zero(S.z))
    (x0, x1), (y0, y1) = F.to_int(ax), F.to_int(ay)
    windows = [
        None if inf[w] else ((int(x0[w]), int(x1[w])), (int(y0[w]), int(y1[w])))
        for w in range(digits.shape[0])
    ]
    return _host_horner(windows, c, fq2=True)
