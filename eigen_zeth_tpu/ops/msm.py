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


def scalar_limbs(scalars, nbits: int = 254) -> np.ndarray:
    """Host ints -> (N, K) uint32 little-endian limbs, K = ceil(nbits/32).

    In the production prover scalars arrive as device limb arrays
    already (witness values); this is the host-int convenience path."""
    nlimbs = (nbits + 31) // 32
    buf = b"".join(int(s).to_bytes(nlimbs * 4, "little") for s in scalars)
    return np.frombuffer(buf, dtype=np.uint32).reshape(len(scalars), nlimbs).copy()


def digits_from_limbs(limbs, c: int = DEFAULT_C, nbits: int = 254):
    """Device: (N, K) uint32 limbs -> (W, N) uint32 window digits.

    Fully vectorized (the round-1 O(W·N) python loop was the #1 MSM
    bottleneck flagged in VERDICT); each window's bits span at most two
    limbs, extracted with shifts on the whole array."""
    limbs = jnp.asarray(limbs, dtype=jnp.uint32)
    n, k = limbs.shape
    n_windows = (nbits + c - 1) // c
    padded = jnp.concatenate([limbs, jnp.zeros((n, 1), jnp.uint32)], axis=1)
    mask = jnp.uint32((1 << c) - 1)
    rows = []
    for w in range(n_windows):
        off = c * w
        limb, r = divmod(off, 32)
        vals = padded[:, limb] >> r
        if r:
            vals = vals | (padded[:, limb + 1] << (32 - r))
        rows.append(vals & mask)
    return jnp.stack(rows, axis=0)


def signed_digits_from_limbs(limbs, c: int = 13, nbits: int = 254):
    """Device: (N, K) uint32 limbs -> signed window digits as
    (mag, sign): two (W, N) arrays, mag in [0, 2^(c-1)], sign True for
    negative digits.

    Signed (sliding-window) digits halve the bucket count and let c grow
    to 13+ (W = 20 windows instead of 32 at c = 8) — the negative-digit
    points just get their y negated on the way into the bucket sort,
    which is free on the VPU.  Carry propagation across windows is a
    W-step lax.scan on (N,) vectors (trivial next to the bucket sums).

    Requires nbits mod c < c-1 so the top window cannot overflow (true
    for c = 13, nbits = 254: top window holds 7 bits)."""
    assert nbits % c < c - 1 or nbits % c == 0, "top-window overflow risk"
    du = digits_from_limbs(limbs, c, nbits)  # (W, N) in [0, 2^c)
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)

    def step(carry, d):
        d2 = d + carry
        wrap = d2 > half
        mag = jnp.where(wrap, full - d2, d2)
        return wrap.astype(jnp.uint32), (mag, wrap)

    _, (mag, sign) = jax.lax.scan(step, jnp.zeros(du.shape[1], jnp.uint32), du)
    return mag, sign & (mag != 0)


def scalar_digits(scalars, c: int = DEFAULT_C, nbits: int = 254) -> np.ndarray:
    """Host ints -> (W, N) uint32 window digits (numpy-vectorized)."""
    limbs = scalar_limbs(scalars, nbits).astype(np.uint64)
    n = limbs.shape[0]
    padded = np.concatenate([limbs, np.zeros((n, 1), np.uint64)], axis=1)
    n_windows = (nbits + c - 1) // c
    mask = np.uint64((1 << c) - 1)
    out = np.empty((n_windows, n), dtype=np.uint32)
    for w in range(n_windows):
        off = c * w
        limb, r = divmod(off, 32)
        vals = padded[:, limb] >> np.uint64(r)
        if r:
            vals |= padded[:, limb + 1] << np.uint64(32 - r)
        out[w] = (vals & mask).astype(np.uint32)
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


def _blocked_seg_scan(G, pts, flags, serial: int = 32, eager: bool = False):
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
    if eager:
        acc, outs = init, []
        for i in range(S):
            acc, _ = step(acc, _tmap(lambda l: l[i], (xs, fx)))
            outs.append(acc)
        ys = _tmap(lambda *ls: jnp.stack(ls, axis=0), *outs)
    else:
        _, ys = jax.lax.scan(step, init, (xs, fx))
    scanned = _tmap(lambda l: jnp.moveaxis(l, 0, -1), ys)  # (..., C, S)

    # phase 2 — combine lane tails
    tails = _tmap(lambda l: l[..., -1], scanned)  # (..., C)
    has_flag = jnp.any(flags_r, axis=-1)  # (..., C)
    lane_scan = _hs_scan(G, tails, flags=has_flag, eager=eager)
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


def _blocked_scan(G, pts, reverse: bool = False, serial: int = 32, eager: bool = False):
    """O(N) plain inclusive scan along the last axis (blocked two-phase;
    all-False flags turn the segmented scan into a single segment)."""
    if reverse:
        pts = _tmap(lambda l: jnp.flip(l, axis=-1), pts)
    leaf0 = jax.tree_util.tree_leaves(pts)[0]
    flags = jnp.zeros(leaf0.shape[1:], dtype=bool)  # drop the element axis
    out = _blocked_seg_scan(G, pts, flags, serial=serial, eager=eager)
    if reverse:
        out = _tmap(lambda l: jnp.flip(l, axis=-1), out)
    return out


def _scan_total(G, pts, eager: bool = False, serial: int = 0):
    """Σ over the last axis = last element of an inclusive plain scan."""
    if serial:
        scanned = _blocked_scan(G, pts, serial=serial, eager=eager)
    else:
        scanned = _hs_scan(G, pts, eager=eager)
    return _tmap(lambda l: l[..., -1], scanned)


# ---------------------------------------------------------------------------
# fast G1 path: unsafe mixed adds (7M+4S) fused with sign/injection in a
# single pallas scan-step kernel, signed digits, row-major point layout
# (TPU gathers/scatters are fast on 128-byte rows, ~30x slower element-
# wise along lanes), and bucket sums recovered by histogram + row gather
# instead of a 48-plane scatter.  ~10x fewer field muls per point than
# the complete-add schedule below (kept as the collision fallback).


def _scan_step(F, acc: PointJ, qx, qy, sgn, flg):
    """One MSM phase-1 step: apply digit sign to qy, unsafe-mixed-add the
    affine point into acc, re-inject at segment starts.  Returns
    (PointJ, bad_plane); bad is already masked by ~flg.

    Dispatches to the fused pallas kernel on TPU for real batches, else
    an XLA mirror built from bn254.point_madd_unsafe."""
    leaf = acc.x
    size = 1
    for d in leaf.shape[1:]:
        size *= d
    from .bigint import _pallas_enabled

    if isinstance(F, bn254.FqOps) and leaf.ndim >= 2 and size >= 512 and _pallas_enabled():
        from .pallas.ec_pl import point_scan_step_pallas

        ctx = F.ctx
        batch = leaf.shape[1:]
        flat = lambda l: l.reshape(ctx.L, -1)
        x3, y3, z3, bad = point_scan_step_pallas(
            ctx,
            (flat(acc.x), flat(acc.y), flat(acc.z)),
            (flat(qx), flat(qy)),
            sgn.astype(jnp.uint32).reshape(-1),
            flg.astype(jnp.uint32).reshape(-1),
        )
        unflat = lambda l: l.reshape((ctx.L,) + batch)
        return PointJ(unflat(x3), unflat(y3), unflat(z3)), bad.reshape(batch) != 0
    qy2 = F.select(sgn, F.neg(qy), qy)
    new, b = bn254.point_madd_unsafe(F, acc, qx, qy2)
    one = F.one_like(qx)
    out = PointJ(
        F.select(flg, qx, new.x),
        F.select(flg, qy2, new.y),
        F.select(flg, one, new.z),
    )
    return out, b & ~flg


def g1_window_sums_fast(
    F,
    xs,
    ys,
    inf,
    mag: jnp.ndarray,
    sign: jnp.ndarray,
    c: int = 13,
    serial: int = 32,
    window_group: int = 32,
    eager: bool = False,
):
    """Per-window sums S_w = sum_b b*B_b from signed digits, fast schedule.

    xs, ys: (L, N) affine Montgomery coordinates; inf: (N,) bool;
    mag/sign: (W, N) signed digits.  Returns (PointJ leaves (L, W),
    bad scalar bool — True means an unsafe add hit P == +-Q and the
    caller must recompute via the complete-add pipeline).

    Schedule (per window group of g windows):
      sort    argsort by digit magnitude; gather points as (g, N, 2L)
              row-major rows (row gathers ride the DMA engines)
      phase 1 (C lanes x S serial) running sums via a lax.scan whose body
              is ONE fused pallas kernel: sign select + unsafe mixed add
              + segment-restart injection + collision flag
      phase 2 lane tails combine with the COMPLETE add at 1/S width
              (empty buckets/infinities live here)
      phase 3 the one cross-lane segment end per lane is corrected by a
              gather + complete add + row scatter (never a full-width add)
      buckets a digit histogram + cumsum locates each bucket's segment
              end; ONE row gather of (g, B) rows replaces the dense
              bucket scatter; absent buckets become infinities
      reduce  suffix + total Hillis-Steele scans over the B bucket sums
              give sum_b b*B_b per window
    """
    G = ECGroup(F)
    L = xs.shape[0]
    n_windows, n = mag.shape
    B = 1 << (c - 1)
    mag = jnp.where(inf[None, :], jnp.uint32(0), mag)
    S_ = serial
    while n % S_:
        S_ //= 2
    C = n // S_
    pts_rows = jnp.concatenate([xs.T, ys.T], axis=1)  # (N, 2L) row-major

    window_sums = []
    bad_any = jnp.zeros((), bool)
    for start in range(0, n_windows, window_group):
        mg = mag[start : start + window_group]
        sg = sign[start : start + window_group]
        g = mg.shape[0]
        # ONE multi-operand sort carries sign + index along with the digit
        # key: the round-2 argsort + two take_along_axis paid ~12 ns/row
        # of per-element gather latency TWICE over (g, N) — measured
        # ~125 ms of the 305 ms MSM at 2^18 (scripts/prof_msm2.py)
        iota = jax.lax.broadcasted_iota(jnp.int32, mg.shape, 1)
        mag_s, sign_s, order = jax.lax.sort(
            (mg, sg.astype(jnp.uint32), iota), dimension=-1, num_keys=1
        )
        sign_s = sign_s.astype(bool)
        rows_s = jnp.take(pts_rows, order, axis=0)  # (g, N, 2L)

        first = jnp.ones((g, 1), dtype=bool)
        flags = jnp.concatenate([first, mag_s[:, 1:] != mag_s[:, :-1]], axis=-1)

        # --- phase 1: fused scan over the serial axis ---------------------
        rows_r = rows_s.reshape(g, C, S_, 2 * L)
        xq_t = jnp.transpose(rows_r[..., :L], (2, 3, 0, 1))  # (S, L, g, C)
        yq_t = jnp.transpose(rows_r[..., L:], (2, 3, 0, 1))
        fr = flags.reshape(g, C, S_)
        lane_start = fr.at[..., 0].set(True)
        f_t = jnp.moveaxis(lane_start, -1, 0)  # (S, g, C)
        s_t = jnp.moveaxis(sign_s.reshape(g, C, S_), -1, 0)

        def step(carry, inp):
            acc, badacc = carry
            xv, yv, sv, fv = inp
            out, b = _scan_step(F, acc, xv, yv, sv, fv)
            return (out, badacc | b), out

        z = jnp.zeros((L, g, C), jnp.uint32)
        init = (PointJ(z, z, z), jnp.zeros((g, C), bool))
        if eager:
            carry, outs = init, []
            for i in range(S_):
                carry, out = step(carry, (xq_t[i], yq_t[i], s_t[i], f_t[i]))
                outs.append(out)
            tails, badp = carry
            scanned = PointJ(
                *(jnp.stack([getattr(o, f_) for o in outs], axis=0)
                  for f_ in ("x", "y", "z"))
            )
        else:
            (tails, badp), scanned = jax.lax.scan(
                step, init, (xq_t, yq_t, s_t, f_t)
            )
        bad_any = bad_any | jnp.any(badp)

        # --- phase 2: combine lane tails (complete add, width C) ----------
        has_flag = jnp.any(fr, axis=-1)
        if C > 64:
            lane_scan = _blocked_seg_scan(
                G, tails, has_flag, serial=serial, eager=eager
            )
        else:
            lane_scan = _hs_scan(G, tails, flags=has_flag, eager=eager)
        shifted = _tmap(lambda l: jnp.roll(l, 1, axis=-1), lane_scan)
        idx_c = jax.lax.broadcasted_iota(jnp.int32, (C,), 0)
        connected = (idx_c > 0) & ~fr[..., 0]
        identity = _tmap(jnp.zeros_like, shifted)
        inflow = G.select(connected, shifted, identity)

        # --- buckets: gather each bucket's segment-end sum directly -------
        # (replaces the round-2-draft phase 3, which materialised and
        # scatter-corrected a (g, n, 3L) row copy of the whole scanned
        # array — ~300 ms of pure HBM shuffling at 2^18; the profile in
        # scripts/prof_msm2.py showed the EC math itself is ~50 ms)
        # histogram via branchless binary search on the SORTED digits —
        # the round-2 scatter-add (.at[g_idx, mag_s].add(1)) paid
        # per-element scatter latency over (g, N): ~55 ms at 2^18;
        # log2(N) gathers of (g, B+1) run in ~23 ms (and vmapped
        # jnp.searchsorted lowers worse, 67 ms — scripts/prof_msm2.py)
        ids = jnp.arange(B + 1, dtype=mag_s.dtype)[None, :]
        g_i = jnp.arange(g)[:, None]

        def _counts(le_ids):
            """#elements per window with value <= le_ids (branchless)."""
            pos_ = jnp.zeros((g, B + 1), jnp.int32)
            for k in range(n.bit_length() - 1, -1, -1):
                cand = pos_ + (1 << k)
                v = mag_s[g_i, jnp.minimum(cand, n) - 1]
                pos_ = jnp.where((cand <= n) & (v <= le_ids), cand, pos_)
            return pos_

        right = _counts(ids)
        left = jnp.where(ids > 0, _counts(ids - 1), 0)
        hist = right - left  # (g, B+1)
        pos = right - 1  # inclusive end of bucket b
        present = hist > 0
        pos_c = jnp.maximum(pos, 0)
        end_lane = (pos_c // S_).astype(jnp.int32)  # (g, B+1)
        end_step = (pos_c % S_).astype(jnp.int32)
        start = pos_c - hist + 1  # first sorted index of bucket b
        g_idx = jnp.arange(g)[:, None]
        # scanned leaves are (S, L, g, C): pick [end_step, :, g, end_lane]
        # -> (g, B+1, L) -> (L, g, B+1)
        val = _tmap(
            lambda l: jnp.moveaxis(l[end_step, :, g_idx, end_lane], -1, 0),
            scanned,
        )
        # a bucket whose segment crosses its end-lane's start needs that
        # lane's inflow (phase 2) added; inflow leaves are (L, g, C)
        inflow_b = _tmap(lambda l: l[:, g_idx, end_lane], inflow)
        needs = present & (start < end_lane * S_)
        identity = _tmap(jnp.zeros_like, inflow_b)
        corrected = G.add(val, G.select(needs, inflow_b, identity))
        ez = jnp.where(present, corrected.z, jnp.uint32(0))
        E = PointJ(corrected.x[..., 1:], corrected.y[..., 1:], ez[..., 1:])

        # --- reduce: S_w = sum_b b*B_b via suffix + total scans -----------
        # blocked O(B) schedules (~2B adds each) instead of Hillis-Steele
        # (B·log2 B): at c=13 this is ~5x fewer bucket adds per window
        suffix = _blocked_scan(G, E, reverse=True, serial=serial, eager=eager)
        window_sums.append(_scan_total(G, suffix, serial=serial, eager=eager))

    S = _tmap(lambda *ls: jnp.concatenate(ls, axis=-1), *window_sums)
    return S, bad_any


def msm_window_sums(
    G,
    points,
    digits: jnp.ndarray,
    c: int = DEFAULT_C,
    window_group: int = 32,
    eager: bool = False,
    serial: int = 0,
):
    """Per-window bucket-aggregated sums S_w = Σ_b b·B_b; leaves (..., W).

    serial > 0 switches every scan from Hillis-Steele (N·log2 N group
    ops) to the blocked two-phase schedule (~2-3N group ops) with that
    many sequential steps per lane — the production TPU configuration;
    serial = 0 keeps the log-step schedule (tiny trace, used by small
    eager tests)."""
    n_windows, n = digits.shape
    nbuckets = 1 << c

    def seg_scan(pts, flags):
        if serial:
            return _blocked_seg_scan(G, pts, flags, serial=serial, eager=eager)
        return _hs_scan(G, pts, flags=flags, eager=eager)

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
        scanned = seg_scan(pts, flags)

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
        if serial:
            suffix = _blocked_scan(G, buckets, reverse=True, serial=serial, eager=eager)
        else:
            suffix = _hs_scan(G, buckets, reverse=True, eager=eager)
        window_sums.append(
            _scan_total(G, suffix, eager=eager, serial=serial)
        )  # leaves (..., g)

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


def gen_test_points(n_log2: int, seed: int = 5):
    """2^n distinct device G1 points with known dlogs (bench/tune support).

    Builds P_{a,b} = B_a + C_b from two sqrt-size host sets so the
    correctness gate is ONE host scalar-mul of G by Σ s_i·k_i instead of
    2^n host scalar-muls.  Returns (xs, ys, dlogs): affine Montgomery limb
    arrays (16, 2^n) plus the host dlog list."""
    assert n_log2 >= 2
    h = n_log2 // 2
    na, nb = 1 << (n_log2 - h), 1 << h
    rng = np.random.default_rng(seed)
    ka = [int(x) for x in rng.integers(1, 1 << 60, size=na, dtype=np.int64)]
    kb = [int(x) << 61 for x in rng.integers(1, 1 << 60, size=nb, dtype=np.int64)]
    A = [bn254.h_ec_mul_jac(k, bn254.G1_GEN) for k in ka]
    B = [bn254.h_ec_mul_jac(k, bn254.G1_GEN) for k in kb]
    F = bn254.FqOps()
    ax = F.ctx.from_int([p[0] for p in A]).reshape(16, na, 1)
    ay = F.ctx.from_int([p[1] for p in A]).reshape(16, na, 1)
    bx = F.ctx.from_int([p[0] for p in B]).reshape(16, 1, nb)
    by = F.ctx.from_int([p[1] for p in B]).reshape(16, 1, nb)

    # chunk the pairwise add over the b-axis: the full (16, na, nb)
    # Jacobian-add graph OOMs HBM at 2^20 (na=nb=1024)
    cb = min(nb, max(1, (1 << 16) // na))

    @jax.jit
    def combine(ax, ay, bxc, byc):
        one = F.one_like(ax)
        pa = PointJ(
            jnp.broadcast_to(ax, (16, na, cb)),
            jnp.broadcast_to(ay, (16, na, cb)),
            jnp.broadcast_to(one, (16, na, cb)),
        )
        pb = PointJ(
            jnp.broadcast_to(bxc, (16, na, cb)),
            jnp.broadcast_to(byc, (16, na, cb)),
            jnp.broadcast_to(one, (16, na, cb)),
        )
        s = point_add(F, pa, pb)
        x, y = to_affine(F, s)
        return x, y

    xs_parts, ys_parts = [], []
    for off in range(0, nb, cb):
        x, y = combine(ax, ay, bx[:, :, off : off + cb], by[:, :, off : off + cb])
        xs_parts.append(x)
        ys_parts.append(y)
    xs = jnp.concatenate(xs_parts, axis=2).reshape(16, -1)
    ys = jnp.concatenate(ys_parts, axis=2).reshape(16, -1)
    jax.block_until_ready(xs)
    dlogs = [ka[i] + kb[j] for i in range(na) for j in range(nb)]
    return xs, ys, dlogs


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


# production serial depth for the blocked scans (tuned on v5e: deep
# enough that the O(N) schedule dominates Hillis-Steele, shallow enough
# that the per-step vector stays full-width)
DEFAULT_SERIAL = 32


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _msm_pipeline_jit(g2: bool, points: PointJ, limbs, c, serial, window_group):
    """End-to-end device MSM: limb scalars -> digits -> sorted segmented
    bucket sums -> per-window affine sums.  One dispatch; everything
    (digit extraction included) stays on chip — the round-1 host digit
    loop was the #1 MSM bottleneck flagged in VERDICT."""
    F = bn254.Fq2Ops() if g2 else bn254.FqOps()
    digits = digits_from_limbs(limbs, c=c)
    S = msm_window_sums(
        ECGroup(F), points, digits, c=c, window_group=window_group, serial=serial
    )
    ax, ay = to_affine(F, S)
    return ax, ay, F.is_zero(S.z)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _msm_g1_fast_jit(xs, ys, inf, limbs, c, serial, window_group):
    """Fast end-to-end device G1 MSM: limb scalars -> signed digits ->
    sorted segmented bucket sums via unsafe mixed adds -> per-window
    affine sums + a collision flag (True -> caller must fall back to the
    complete-add pipeline)."""
    F = bn254.FqOps()
    mag, sign = signed_digits_from_limbs(limbs, c=c)
    S, bad = g1_window_sums_fast(
        F, xs, ys, inf, mag, sign, c=c, serial=serial, window_group=window_group
    )
    ax, ay = to_affine(F, S)
    return ax, ay, F.is_zero(S.z), bad


def msm_g1_fast(
    points_int,
    scalars,
    c: int = 13,
    serial: int = 32,
    window_group: int = 32,
    eager: bool = False,
):
    """Σ s_i·P_i on G1 via the fast schedule (signed digits + unsafe
    mixed adds); host ints in, affine host ints out (None = infinity).

    Sound for arbitrary inputs: any P == ±Q collision the unsafe formula
    cannot handle raises a device-side flag and the complete-add pipeline
    (msm_g1) recomputes the result."""
    F = bn254.FqOps()
    xs = F.ctx.from_int([p[0] if p is not None else 0 for p in points_int])
    ys = F.ctx.from_int([p[1] if p is not None else 0 for p in points_int])
    inf = jnp.asarray(np.array([p is None for p in points_int]))
    limbs = jnp.asarray(scalar_limbs(scalars))
    if eager:
        mag, sign = signed_digits_from_limbs(limbs, c=c)
        S, bad = g1_window_sums_fast(
            F, xs, ys, inf, mag, sign, c=c, serial=serial,
            window_group=window_group, eager=True,
        )
        ax, ay = to_affine(F, S)
        inf_w = F.is_zero(S.z)
    else:
        ax, ay, inf_w, bad = _msm_g1_fast_jit(
            xs, ys, inf, limbs, c, serial, window_group
        )
    if bool(np.asarray(bad)):
        return msm_g1(points_int, scalars, use_jit=not eager)
    inf_w = np.asarray(inf_w)
    xs_i, ys_i = F.to_int(ax), F.to_int(ay)
    windows = [
        None if inf_w[w] else (int(xs_i[w]), int(ys_i[w]))
        for w in range(inf_w.shape[0])
    ]
    return _host_horner(windows, c)


def msm_g1_device(
    xs,
    ys,
    inf,
    scalars,
    c: int | None = None,
    serial: int = 32,
    window_group: int = 32,
    eager: bool = False,
):
    """Fast G1 MSM over points already resident on device as Montgomery
    limb arrays (e.g. a KZG SRS) — skips the host->device point upload
    that msm_g1_fast pays on every call.  Host affine ints out.

    c=None picks the window width from N (Pippenger's optimum ~log2(N):
    bucket-reduce cost W·2^(c-1) must not swamp the N·W/1 scan cost)."""
    F = bn254.FqOps()
    if c is None:
        n = xs.shape[1]
        c = 13 if n >= 4096 else (8 if n >= 256 else 4)
    limbs = jnp.asarray(scalar_limbs(scalars))
    if eager:
        mag, sign = signed_digits_from_limbs(limbs, c=c)
        S, bad = g1_window_sums_fast(
            F, xs, ys, inf, mag, sign, c=c, serial=serial,
            window_group=window_group, eager=True,
        )
        ax, ay = to_affine(F, S)
        inf_w = F.is_zero(S.z)
    else:
        ax, ay, inf_w, bad = _msm_g1_fast_jit(
            xs, ys, inf, limbs, c, serial, window_group
        )
    if bool(np.asarray(bad)):
        # rare P == ±Q collision: re-run through the complete-add pipeline
        xs_i, ys_i = F.to_int(xs), F.to_int(ys)
        inf_h = np.asarray(inf)
        pts = [
            None if inf_h[i] else (int(xs_i[i]), int(ys_i[i]))
            for i in range(inf_h.shape[0])
        ]
        return msm_g1(pts, scalars, use_jit=not eager)
    inf_w = np.asarray(inf_w)
    xs_i, ys_i = F.to_int(ax), F.to_int(ay)
    windows = [
        None if inf_w[w] else (int(xs_i[w]), int(ys_i[w]))
        for w in range(inf_w.shape[0])
    ]
    return _host_horner(windows, c)


# ---------------------------------------------------------------------------
# fixed-base MSM: precomputed window tables.  Production MSMs run against
# FIXED point sets (a KZG SRS, a Groth16 proving key — the reference's
# analog is the SRS inside its external prover + c-kzg's trusted setup,
# /root/reference/Cargo.toml:73).  Precomputing T[w·N+i] = 2^(cw)·P_i
# turns the W-window Pippenger into a SINGLE merged window over W·N
# digit/point pairs:
#   * the dominant cost — the sort-order row gather — shrinks by
#     W_old/W_new (larger c is affordable because only ONE bucket
#     reduction of 2^(c-1) sums remains, not one per window)
#   * the Horner window combine (c doublings per window) disappears;
#     the single bucket reduction Σ b·B_b IS the MSM result.


@functools.partial(jax.jit, static_argnums=(3, 4))
def _g1_table_jit(xs, ys, inf, c, n_windows):
    """Affine (L, N) base points -> affine table (L, W·N) + (W·N,) inf.

    Slab w holds 2^(cw)·P_i: a lax.scan over windows, each step applying
    c Jacobian doublings (one point_double in the trace), then ONE
    vectorized Jacobian->affine conversion of the whole table."""
    F = bn254.FqOps()
    one = F.one_like(xs)
    p0 = PointJ(xs, ys, F.select(inf, F.zero_like(one), one))

    def win(p, _):
        nxt = jax.lax.fori_loop(0, c, lambda _i, q: point_double(F, q), p)
        return nxt, p

    _, slabs = jax.lax.scan(win, p0, None, length=n_windows)
    # scan stacks on axis 0: leaves (W, L, N) -> (L, W·N), w-major to
    # match signed_digits_from_limbs(...).reshape(1, W·N)
    tj = PointJ(
        *(jnp.moveaxis(l, 0, 1).reshape(l.shape[1], -1) for l in slabs)
    )
    txs, tys = to_affine(F, tj)
    tinf = jnp.tile(inf, n_windows)
    return txs, tys, tinf


class G1Table:
    """Precomputed fixed-base table for msm_g1_table (device-resident)."""

    def __init__(self, txs, tys, tinf, c: int, n: int):
        self.txs, self.tys, self.tinf = txs, tys, tinf
        self.c = c
        self.n = n
        self.n_windows = (254 + c - 1) // c


def g1_build_table(points_int, c: int = 16, eager: bool = False) -> G1Table:
    """Precompute the fixed-base window table (one-time per SRS/pk).

    eager=True builds on the host (python bigints) — the CPU test path,
    where XLA EC compiles are prohibitive."""
    assert 254 % c < c - 1 or 254 % c == 0, "top-window overflow risk"
    F = bn254.FqOps()
    W = (254 + c - 1) // c
    if eager:
        entries = []
        for w in range(W):
            mult = 1 << (c * w)
            entries += [
                None if p is None else bn254.h_ec_mul(mult, p)
                for p in points_int
            ]
        txs = F.ctx.from_int([p[0] if p is not None else 0 for p in entries])
        tys = F.ctx.from_int([p[1] if p is not None else 0 for p in entries])
        tinf = jnp.asarray(np.array([p is None for p in entries]))
        return G1Table(txs, tys, tinf, c, len(points_int))
    xs = F.ctx.from_int([p[0] if p is not None else 0 for p in points_int])
    ys = F.ctx.from_int([p[1] if p is not None else 0 for p in points_int])
    inf = jnp.asarray(np.array([p is None for p in points_int]))
    txs, tys, tinf = _g1_table_jit(xs, ys, inf, c, W)
    return G1Table(txs, tys, tinf, c, len(points_int))


@functools.partial(jax.jit, static_argnums=(4, 5))
def _msm_g1_table_jit(txs, tys, tinf, limbs, c, serial):
    """Fixed-base MSM query: signed digits -> ONE merged window over the
    precomputed table -> the MSM result directly (no Horner)."""
    F = bn254.FqOps()
    mag, sign = signed_digits_from_limbs(limbs, c=c)
    n_windows, n = mag.shape
    S, bad = g1_window_sums_fast(
        F,
        txs,
        tys,
        tinf,
        mag.reshape(1, n_windows * n),
        sign.reshape(1, n_windows * n),
        c=c,
        serial=serial,
        window_group=1,
    )
    ax, ay = to_affine(F, S)
    return ax, ay, F.is_zero(S.z), bad


def msm_g1_table(
    table: G1Table, scalars, serial: int = DEFAULT_SERIAL, eager: bool = False
):
    """Σ s_i·P_i against a precomputed G1Table; host affine ints out.

    Sound for arbitrary scalars: the unsafe-add collision flag falls back
    to the complete-add pipeline on the base points (slab 0)."""
    limbs = jnp.asarray(scalar_limbs(scalars))
    F = bn254.FqOps()
    if eager:
        mag, sign = signed_digits_from_limbs(limbs, c=table.c)
        n_windows, n = mag.shape
        S, bad = g1_window_sums_fast(
            F, table.txs, table.tys, table.tinf,
            mag.reshape(1, n_windows * n), sign.reshape(1, n_windows * n),
            c=table.c, serial=serial, window_group=1, eager=True,
        )
        ax, ay = to_affine(F, S)
        inf_w = F.is_zero(S.z)
    else:
        ax, ay, inf_w, bad = _msm_g1_table_jit(
            table.txs, table.tys, table.tinf, limbs, table.c, serial
        )
    if bool(np.asarray(bad)):
        xs_i = F.to_int(table.txs[:, : table.n])
        ys_i = F.to_int(table.tys[:, : table.n])
        inf_h = np.asarray(table.tinf[: table.n])
        pts = [
            None if inf_h[i] else (int(xs_i[i]), int(ys_i[i]))
            for i in range(table.n)
        ]
        return msm_g1(pts, scalars, use_jit=not eager)
    if bool(np.asarray(inf_w)[0]):
        return None
    return int(F.to_int(ax)[0]), int(F.to_int(ay)[0])


def msm_g1(
    points_int,
    scalars,
    c: int = DEFAULT_C,
    use_jit: bool = True,
    serial: int = DEFAULT_SERIAL,
    window_group: int = 32,
):
    """Σ s_i·P_i on G1; host ints in, affine host ints out (None = inf).

    use_jit=False runs eagerly — used by the hermetic CPU test suite,
    where XLA CPU compile times for EC graphs are prohibitive; production
    (TPU) runs always jit."""
    F = bn254.FqOps()
    pts = _g1_device_points(points_int)
    # device window sums, host Horner combine (the device Horner is a
    # 2^c·W-step sequential tail of tiny kernels — host bigints win)
    if use_jit:
        limbs = jnp.asarray(scalar_limbs(scalars))
        ax, ay, inf = _msm_pipeline_jit(False, pts, limbs, c, serial, window_group)
        inf = np.asarray(inf)
    else:
        digits = jnp.asarray(scalar_digits(scalars, c))
        S = msm_window_sums(ECGroup(F), pts, digits, c=c, eager=True)
        ax, ay = to_affine(F, S)
        inf = np.asarray(F.is_zero(S.z))
    xs, ys = F.to_int(ax), F.to_int(ay)
    n_windows = (254 + c - 1) // c
    windows = [
        None if inf[w] else (int(xs[w]), int(ys[w])) for w in range(n_windows)
    ]
    return _host_horner(windows, c)


def msm_g2(
    points_int,
    scalars,
    c: int = DEFAULT_C,
    use_jit: bool = True,
    serial: int = DEFAULT_SERIAL,
    window_group: int = 32,
):
    """Σ s_i·P_i on G2; host int pairs in, affine ((x0,x1),(y0,y1)) out."""
    F = bn254.Fq2Ops()
    pts = _g2_device_points(points_int)
    if use_jit:
        limbs = jnp.asarray(scalar_limbs(scalars))
        ax, ay, inf = _msm_pipeline_jit(True, pts, limbs, c, serial, window_group)
        inf = np.asarray(inf)
    else:
        digits = jnp.asarray(scalar_digits(scalars, c))
        S = msm_window_sums(ECGroup(F), pts, digits, c=c, eager=True)
        ax, ay = to_affine(F, S)
        inf = np.asarray(F.is_zero(S.z))
    (x0, x1), (y0, y1) = F.to_int(ax), F.to_int(ay)
    n_windows = (254 + c - 1) // c
    windows = [
        None if inf[w] else ((int(x0[w]), int(x1[w])), (int(y0[w]), int(y1[w])))
        for w in range(n_windows)
    ]
    return _host_horner(windows, c, fq2=True)
