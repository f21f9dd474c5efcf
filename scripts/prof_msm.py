"""Stage-by-stage timing of the fast MSM pipeline (run on the real chip)."""

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
scalars = [int.from_bytes(rng.bytes(40), "big") % bn254.R for _ in range(n)]
limbs = jnp.asarray(msm.scalar_limbs(scalars))


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]  # force a real host read (block_until_ready
    # does not reliably block on the axon tunnel backend)


def t(f, *args, label="", iters=8):
    jf = jax.jit(f)
    out = jf(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = jf(*args)
    _sync(out)
    print(f"{label:44s} {(time.time()-t0)/iters*1e3:9.2f} ms (incl ~4ms RT)")
    return out


mag, sign = t(lambda l: msm.signed_digits_from_limbs(l, c=c), limbs, label="signed digits")
order = t(lambda m: jnp.argsort(m, axis=-1), mag, label="argsort")
pts_rows = t(
    lambda x, y: jnp.concatenate([x.T, y.T], axis=1), xs, ys, label="rows layout"
)
rows_s = t(lambda p, o: jnp.take(p, o, axis=0), pts_rows, order, label="row gather (g,N,32)")
mag_s = jnp.take_along_axis(mag, order, axis=-1)
sign_s = jnp.take_along_axis(sign, order, axis=-1)
first = jnp.ones((g, 1), dtype=bool)
flags = jnp.concatenate([first, mag_s[:, 1:] != mag_s[:, :-1]], axis=-1)


def prep(rows_s, flags, sign_s):
    rows_r = rows_s.reshape(g, C, S_, 2 * L)
    xq_t = jnp.transpose(rows_r[..., :L], (2, 3, 0, 1))
    yq_t = jnp.transpose(rows_r[..., L:], (2, 3, 0, 1))
    fr = flags.reshape(g, C, S_)
    lane_start = fr.at[..., 0].set(True)
    f_t = jnp.moveaxis(lane_start, -1, 0)
    s_t = jnp.moveaxis(sign_s.reshape(g, C, S_), -1, 0)
    return xq_t, yq_t, f_t, s_t, fr


xq_t, yq_t, f_t, s_t, fr = t(prep, rows_s, flags, sign_s, label="transpose to (S,L,g,C)")


def phase1(xq_t, yq_t, s_t, f_t):
    def step(carry, inp):
        acc, badacc = carry
        xv, yv, sv, fv = inp
        out, b = msm._scan_step(F, acc, xv, yv, sv, fv)
        return (out, badacc | b), out

    z = jnp.zeros((L, g, C), jnp.uint32)
    init = (PointJ(z, z, z), jnp.zeros((g, C), bool))
    (tails, badp), scanned = jax.lax.scan(step, init, (xq_t, yq_t, s_t, f_t))
    return tails, badp, scanned


tails, badp, scanned = t(phase1, xq_t, yq_t, s_t, f_t, label=f"phase1 scan (S={S_})")


def phase2(tails):
    has_flag = jnp.any(fr, axis=-1)
    lane_scan = msm._blocked_seg_scan(G, tails, has_flag, serial=serial)
    shifted = msm._tmap(lambda l: jnp.roll(l, 1, axis=-1), lane_scan)
    idx_c = jax.lax.broadcasted_iota(jnp.int32, (C,), 0)
    connected = (idx_c > 0) & ~fr[..., 0]
    identity = msm._tmap(jnp.zeros_like, shifted)
    return G.select(connected, shifted, identity)


inflow = t(phase2, tails, label="phase2 lane tails")


def phase3(scanned, inflow):
    has_flag = jnp.any(fr, axis=-1)
    rows_sc = jnp.concatenate(
        [jnp.transpose(l, (2, 3, 0, 1)) for l in scanned], axis=-1
    )
    ff = jnp.argmax(fr, axis=-1)
    t_idx = jnp.where(has_flag, jnp.maximum(ff, 1) - 1, S_ - 1).astype(jnp.int32)
    next_start = jnp.concatenate([fr[:, 1:, 0], jnp.ones((g, 1), bool)], axis=1)
    valid = (has_flag & (ff > 0)) | (~has_flag & next_start)
    t4 = jnp.broadcast_to(t_idx[:, :, None, None], (g, C, 1, 3 * L))
    g_rows = jnp.take_along_axis(rows_sc, t4, axis=2)[:, :, 0, :]
    g_pl = jnp.transpose(g_rows, (2, 0, 1))
    gathered = PointJ(g_pl[:L], g_pl[L : 2 * L], g_pl[2 * L :])
    corrected = G.add(gathered, inflow)
    corr_rows = jnp.transpose(jnp.concatenate(list(corrected), axis=0), (1, 2, 0))
    write_rows = jnp.where(valid[..., None], corr_rows, g_rows)
    rows_flat = rows_sc.reshape(g, n, 3 * L)
    idx_c = jax.lax.broadcasted_iota(jnp.int32, (C,), 0)
    flat_pos = idx_c[None, :] * S_ + t_idx
    return rows_flat.at[jnp.arange(g)[:, None], flat_pos].set(write_rows)


rows_flat = t(phase3, scanned, inflow, label="phase3 rows + correction")


def buckets(rows_flat, mag_s):
    hist = jnp.zeros((g, B + 1), jnp.int32).at[jnp.arange(g)[:, None], mag_s].add(1)
    pos = jnp.cumsum(hist, axis=1) - 1
    pos_c = jnp.maximum(pos, 0)
    e_rows = jnp.take_along_axis(
        rows_flat, jnp.broadcast_to(pos_c[:, :, None], (g, B + 1, 3 * L)), axis=1
    )
    mag_at = jnp.take_along_axis(mag_s, pos_c, axis=1)
    present = (mag_at == jnp.arange(B + 1, dtype=jnp.uint32)[None, :]) & (pos >= 0)
    e_pl = jnp.transpose(e_rows, (2, 0, 1))
    ez = jnp.where(present, e_pl[2 * L :], jnp.uint32(0))
    return PointJ(e_pl[:L, ..., 1:], e_pl[L : 2 * L, ..., 1:], ez[..., 1:])


E = t(buckets, rows_flat, mag_s, label="bucket hist + end gather")


def reduce_(E):
    suffix = msm._hs_scan(G, E, reverse=True)
    return msm._scan_total(G, suffix)


t(reduce_, E, label=f"suffix+total reduce (B={B})")


def full(xs, ys, limbs):
    inf0 = jnp.zeros((n,), bool)
    return msm._msm_g1_fast_jit.__wrapped__(xs, ys, inf0, limbs, c, serial, W)


t(full, xs, ys, limbs, label="FULL window sums")
