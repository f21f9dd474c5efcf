"""Marginal-cost profile of the FIXED-BASE (table) MSM pipeline: jit
progressively longer prefixes of the single-merged-window
g1_window_sums_fast body and difference the timings (run on chip).

Usage: python scripts/prof_msm3.py [n_log2] [c] [serial]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from eigen_zeth_tpu.ops import bn254, msm
from eigen_zeth_tpu.ops.bn254 import PointJ

n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
c = int(sys.argv[2]) if len(sys.argv) > 2 else 16
serial = int(sys.argv[3]) if len(sys.argv) > 3 else 32
n = 1 << n_log2
W = (254 + c - 1) // c
N = W * n  # merged single window
L = 16
B = 1 << (c - 1)
S_ = serial
C = N // S_

rng = np.random.default_rng(1)
F = bn254.FqOps()
G = msm.ECGroup(F)
# synthetic table (values don't affect timing; EC formulas are branch-free)
txs = jnp.asarray(rng.integers(0, 1 << 16, size=(L, N)).astype(np.uint32))
tys = jnp.asarray(rng.integers(0, 1 << 16, size=(L, N)).astype(np.uint32))
tinf = jnp.zeros((N,), bool)
scalars = [int.from_bytes(rng.bytes(40), "big") % bn254.R for _ in range(n)]
limbs = jnp.asarray(msm.scalar_limbs(scalars))


def checksum(x):
    return jax.tree_util.tree_reduce(
        lambda a, l: a + jnp.sum(l.astype(jnp.uint32)), x, jnp.uint32(0)
    )


def prefix(stop):
    def fn(txs, tys, tinf, limbs):
        mag0, sign0 = msm.signed_digits_from_limbs(limbs, c=c)
        mg = mag0.reshape(1, N)
        sg = sign0.reshape(1, N)
        mg = jnp.where(tinf[None, :], jnp.uint32(0), mg)
        if stop == "digits":
            return checksum((mg, sg))
        pts_rows = jnp.concatenate([txs.T, tys.T], axis=1)
        gg = 1
        order = jnp.argsort(mg, axis=-1)
        if stop == "sort":
            return checksum(order)
        mag_s = jnp.take_along_axis(mg, order, axis=-1)
        sign_s = jnp.take_along_axis(sg, order, axis=-1)
        rows_s = jnp.take(pts_rows, order[0], axis=0)[None]
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
            acc, badacc = carry
            xv, yv, sv, fv = inp
            out, b = msm._scan_step(F, acc, xv, yv, sv, fv)
            return (out, badacc | b), out

        z = jnp.zeros((L, gg, C), jnp.uint32)
        init = (PointJ(z, z, z), jnp.zeros((gg, C), bool))
        (tails, badp), scanned = jax.lax.scan(step, init, (xq_t, yq_t, s_t, f_t))
        if stop == "phase1":
            return checksum((tails, scanned))
        has_flag = jnp.any(fr, axis=-1)
        if C > 64:
            lane_scan = msm._blocked_seg_scan(G, tails, has_flag, serial=serial)
        else:
            lane_scan = msm._hs_scan(G, tails, flags=has_flag)
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
        suffix = msm._blocked_scan(G, E, reverse=True, serial=serial)
        total = msm._scan_total(G, suffix, serial=serial)
        return checksum(total)

    return jax.jit(fn)


STAGES = ["digits", "sort", "gather", "layout", "phase1", "phase2", "buckets", "reduce"]

prev = 0.0
for stage in STAGES:
    f = prefix(stage)
    t0 = time.time()
    np.asarray(f(txs, tys, tinf, limbs))
    compile_t = time.time() - t0
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        r = f(txs, tys, tinf, limbs)
    np.asarray(r)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{stage:9s} cum {dt:10.2f} ms   Δ {dt - prev:10.2f} ms   (compile {compile_t:.0f}s)")
    prev = dt
