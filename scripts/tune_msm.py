"""Tune the fast G1 MSM on the real chip.

Generates 2^n distinct points as pairwise sums of two 512-point host sets
(P_{a,b} = B_a + C_b with known dlogs), so the correctness gate is a single
host scalar-mul of G by sum(s_i * k_i) instead of 2^n host scalar-muls.

Usage: python scripts/tune_msm.py [n_log2] [c] [serial] [wg]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from eigen_zeth_tpu.ops import bn254, msm
from eigen_zeth_tpu.ops.bn254 import G1_GEN, from_affine, h_ec_mul, point_add, to_affine


def gen_points(n_log2: int, seed: int = 5):
    """Distinct device points (xs, ys, dlogs) via msm.gen_test_points."""
    t0 = time.time()
    out = msm.gen_test_points(n_log2, seed)
    print(f"point gen 2^{n_log2}: {time.time()-t0:.1f}s", file=sys.stderr)
    return out


def main():
    args = [a for a in sys.argv[1:] if a != "--table"]
    table_mode = "--table" in sys.argv
    n_log2 = int(args[0]) if len(args) > 0 else 18
    c = int(args[1]) if len(args) > 1 else 13
    serial = int(args[2]) if len(args) > 2 else 32
    wg = int(args[3]) if len(args) > 3 else 32
    n = 1 << n_log2
    xs, ys, dlogs = gen_points(n_log2)
    if table_mode:
        return run_table(n_log2, c, serial, xs, ys, dlogs)
    rng = np.random.default_rng(9)
    scalars = [int.from_bytes(rng.bytes(40), "big") % bn254.R for _ in range(n)]
    limbs = jnp.asarray(msm.scalar_limbs(scalars))
    inf = jnp.zeros((n,), bool)

    def run():
        ax, ay, inf_w, bad = msm._msm_g1_fast_jit(xs, ys, inf, limbs, c, serial, wg)
        # force a true host read: block_until_ready does not reliably
        # block on the axon tunnel backend
        np.asarray(ax)
        return ax, ay, np.asarray(inf_w), np.asarray(bad)

    t0 = time.time()
    ax, ay, inf_w, bad = run()
    print(f"first call (compile+run): {time.time()-t0:.1f}s, bad={bool(bad)}")
    assert not bool(bad), "collision flag on distinct points?!"

    F = bn254.FqOps()
    xi, yi = F.to_int(ax), F.to_int(ay)
    windows = [None if inf_w[w] else (int(xi[w]), int(yi[w])) for w in range(len(inf_w))]
    got = msm._host_horner(windows, c)
    want = h_ec_mul(
        sum(k * s for k, s in zip(dlogs, scalars)) % bn254.R, G1_GEN
    )
    assert got == want, "MSM MISMATCH"
    print("correctness gate passed")

    iters = 4
    t0 = time.time()
    for _ in range(iters - 1):
        msm._msm_g1_fast_jit(xs, ys, inf, limbs, c, serial, wg)
    run()  # final host read drains the dispatch queue
    dt = (time.time() - t0) / iters
    print(
        f"g1 msm 2^{n_log2} fast (c={c}, serial={serial}, wg={wg}): "
        f"{dt*1e3:9.2f} ms -> {n/dt:,.0f} points/s"
    )


def run_table(n_log2, c, serial, xs, ys, dlogs):
    """Fixed-base precomputed-table mode: build 2^(cw)·P_i slabs once,
    then time the single-merged-window query."""
    n = 1 << n_log2
    rng = np.random.default_rng(9)
    scalars = [int.from_bytes(rng.bytes(40), "big") % bn254.R for _ in range(n)]
    limbs = jnp.asarray(msm.scalar_limbs(scalars))
    inf = jnp.zeros((n,), bool)
    W = (254 + c - 1) // c

    t0 = time.time()
    txs, tys, tinf = msm._g1_table_jit(xs, ys, inf, c, W)
    np.asarray(tinf)
    print(f"table build (W={W}, compile+run): {time.time()-t0:.1f}s")

    def run():
        ax, ay, inf_w, bad = msm._msm_g1_table_jit(txs, tys, tinf, limbs, c, serial)
        np.asarray(ax)
        return ax, ay, np.asarray(inf_w), np.asarray(bad)

    t0 = time.time()
    ax, ay, inf_w, bad = run()
    print(f"first call (compile+run): {time.time()-t0:.1f}s, bad={bool(bad)}")
    assert not bool(bad), "collision flag on distinct points?!"

    F = bn254.FqOps()
    assert not bool(inf_w[0])
    got = (int(F.to_int(ax)[0]), int(F.to_int(ay)[0]))
    want = h_ec_mul(sum(k * s for k, s in zip(dlogs, scalars)) % bn254.R, G1_GEN)
    assert got == want, "MSM MISMATCH"
    print("correctness gate passed")

    iters = 4
    t0 = time.time()
    for _ in range(iters - 1):
        msm._msm_g1_table_jit(txs, tys, tinf, limbs, c, serial)
    run()
    dt = (time.time() - t0) / iters
    print(
        f"g1 msm 2^{n_log2} table (c={c}, serial={serial}): "
        f"{dt*1e3:9.2f} ms -> {n/dt:,.0f} points/s"
    )


if __name__ == "__main__":
    main()
