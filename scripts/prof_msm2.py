"""Marginal-cost profile of the fast MSM pipeline: jit progressively
longer prefixes of g1_window_sums_fast and difference the timings.
Unlike per-stage jits, every prefix is ONE fused XLA program, so the
deltas reflect real in-context costs (run on the real chip)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from eigen_zeth_tpu.ops import bn254, msm
from eigen_zeth_tpu.ops.bn254 import PointJ

n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
c = int(sys.argv[2]) if len(sys.argv) > 2 else 13
serial = int(sys.argv[3]) if len(sys.argv) > 3 else 32
n = 1 << n_log2
W = (254 + c - 1) // c
g = W
L = 16
B = 1 << (c - 1)
S_ = serial
C = n // S_

rng = np.random.default_rng(1)
F = bn254.FqOps()
G = msm.ECGroup(F)
xs = jnp.asarray(rng.integers(0, 1 << 16, size=(16, n)).astype(np.uint32))
ys = jnp.asarray(rng.integers(0, 1 << 16, size=(16, n)).astype(np.uint32))
inf = jnp.zeros((n,), bool)
scalars = [int.from_bytes(rng.bytes(40), "big") % bn254.R for _ in range(n)]
limbs = jnp.asarray(msm.scalar_limbs(scalars))


def checksum(x):
    """Tiny output that still forces the whole computation."""
    return jax.tree_util.tree_reduce(
        lambda a, l: a + jnp.sum(l.astype(jnp.uint32)), x, jnp.uint32(0)
    )


def prefix(stop):
    """Re-run g1_window_sums_fast's body up to `stop`, return a checksum."""

    def fn(xs, ys, inf, limbs):
        mag, sign = msm.signed_digits_from_limbs(limbs, c=c)
        mag = jnp.where(inf[None, :], jnp.uint32(0), mag)
        if stop == "digits":
            return checksum((mag, sign))
        pts_rows = jnp.concatenate([xs.T, ys.T], axis=1)
        acc = jnp.uint32(0)
        per_window = {}
        start = 0
        mg = mag[start : start + 32]
        sg = sign[start : start + 32]
        gg = mg.shape[0]
        order = jnp.argsort(mg, axis=-1)
        if stop == "sort":
            return checksum(order)
        mag_s = jnp.take_along_axis(mg, order, axis=-1)
        sign_s = jnp.take_along_axis(sg, order, axis=-1)
        rows_s = jnp.take(pts_rows, order, axis=0)
        if stop == "gather":
            return checksum((rows_s, mag_s, sign_s))
        first = jnp.ones((gg, 1), dtype=bool)
        flags = jnp.concatenate([first, mag_s[:, 1:] != mag_s[:, :-1]], axis=-1)
        rows_r = rows_s.reshape(gg, C, S_, 2 * L)
        xq_t = jnp.transpose(rows_r[..., :L], (2, 3, 0, 1))
        yq_t = jnp.transpose(rows_r[..., L:], (2, 3, 0, 1))
        fr = flags.reshape(gg, C, S_)
        lane_start = fr.at[..., 0].set(True)
        f_t = jnp.moveaxis(lane_start, -1, 0)
        s_t = jnp.moveaxis(sign_s.reshape(gg, C, S_), -1, 0)
        if stop == "layout":
            return checksum((xq_t, yq_t, f_t, s_t))

        def step(carry, inp):
            acc2, badacc = carry
            xv, yv, sv, fv = inp
            out, b = msm._scan_step(F, acc2, xv, yv, sv, fv)
            return (out, badacc | b), out

        z = jnp.zeros((L, gg, C), jnp.uint32)
        init = (PointJ(z, z, z), jnp.zeros((gg, C), bool))
        (tails, badp), scanned = jax.lax.scan(step, init, (xq_t, yq_t, s_t, f_t))
        if stop == "phase1":
            return checksum((tails, scanned))
        has_flag = jnp.any(fr, axis=-1)
        lane_scan = msm._blocked_seg_scan(G, tails, has_flag, serial=serial)
        shifted = msm._tmap(lambda l: jnp.roll(l, 1, axis=-1), lane_scan)
        idx_c = jax.lax.broadcasted_iota(jnp.int32, (C,), 0)
        connected = (idx_c > 0) & ~fr[..., 0]
        identity = msm._tmap(jnp.zeros_like, shifted)
        inflow = G.select(connected, shifted, identity)
        if stop == "phase2":
            return checksum((inflow, scanned))
        hist = jnp.zeros((gg, B + 1), jnp.int32).at[
            jnp.arange(gg)[:, None], mag_s
        ].add(1)
        pos = jnp.cumsum(hist, axis=1) - 1
        present = hist > 0
        pos_c = jnp.maximum(pos, 0)
        end_lane = (pos_c // S_).astype(jnp.int32)
        end_step = (pos_c % S_).astype(jnp.int32)
        start = pos_c - hist + 1
        g_idx = jnp.arange(gg)[:, None]
        val = msm._tmap(
            lambda l: jnp.moveaxis(l[end_step, :, g_idx, end_lane], -1, 0),
            scanned,
        )
        inflow_b = msm._tmap(lambda l: l[:, g_idx, end_lane], inflow)
        needs = present & (start < end_lane * S_)
        identity = msm._tmap(jnp.zeros_like, inflow_b)
        corrected = G.add(val, G.select(needs, inflow_b, identity))
        ez = jnp.where(present, corrected.z, jnp.uint32(0))
        E = PointJ(corrected.x[..., 1:], corrected.y[..., 1:], ez[..., 1:])
        if stop == "buckets":
            return checksum(E)
        suffix = msm._hs_scan(G, E, reverse=True)
        S = msm._scan_total(G, suffix)
        return checksum(S)

    return fn


STAGES = [
    "digits", "sort", "gather", "layout", "phase1",
    "phase2", "buckets", "reduce",
]

prev = 0.0
for stage in STAGES:
    jf = jax.jit(prefix(stage))
    out = jf(xs, ys, inf, limbs)
    np.asarray(out)  # true host sync
    iters = 6
    t0 = time.time()
    for _ in range(iters - 1):
        jf(xs, ys, inf, limbs)
    np.asarray(jf(xs, ys, inf, limbs))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{stage:10s} cum {dt:9.2f} ms   Δ {dt - prev:9.2f} ms", flush=True)
    prev = dt
