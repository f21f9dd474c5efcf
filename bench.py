"""Benchmark harness — headline: Goldilocks NTT throughput per chip.

stdout: exactly ONE JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Baseline: BASELINE.json's north-star 2^24 NTT elements/s/chip (the
reference publishes no numbers of its own — BASELINE.md).

Correctness gates run before every timing (round trips + bigint spot
checks) so a fast-but-wrong kernel cannot post a number.

`python bench.py --full` additionally benchmarks Poseidon Merkle commit
(BASELINE config 2), the Pallas Montgomery multiply, G1 MSM (config 3),
and the FRI fold, each with a speed-of-light roofline line on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

# persistent compile cache: TPU compiles of the big NTT/MSM graphs take
# minutes; cached executables make repeated bench/driver runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_NTT_ELEMS_PER_S = float(1 << 24)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, iters=5):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def bench_ntt() -> float:
    from eigen_zeth_tpu.ops import goldilocks as gl
    from eigen_zeth_tpu.ops import ntt as nttm
    from eigen_zeth_tpu.utils import roofline

    n = 1 << 20
    batch = 4
    rng = np.random.default_rng(0xBE7C)
    # four-step (1024x1024) layout: stages slice lanes instead of the
    # concat-heavy flat radix-2 graph — ~6x faster on chip
    plan_f = nttm.make_four_step_plan(n, 1024)
    plan_i = nttm.make_four_step_plan(n, 1024, inverse=True)
    fwd = jax.jit(lambda x: nttm.ntt_four_step(x, plan_f))
    inv = jax.jit(lambda x: nttm.intt_four_step(x, plan_i))
    x = gl.random_gf((batch, n), rng)

    t0 = time.time()
    y = fwd(x)
    jax.block_until_ready(y)
    log(f"ntt first call (compile+run): {time.time() - t0:.1f}s")

    # correctness gate: round trip + direct bigint DFT spot check
    back = inv(y)
    assert np.array_equal(gl.to_int(back), gl.to_int(x)), "NTT round-trip mismatch"
    small = 64
    want = gl.to_int(x)[0, :small]
    sy = gl.to_int(jax.jit(lambda v: nttm.ntt(v, nttm.make_plan(small)))(gl.from_int(want)))
    w = gl.primitive_root_of_unity(small)
    for k in [0, 1, small - 1]:
        expect = sum(int(want[j]) * pow(w, j * k, gl.P) for j in range(small)) % gl.P
        assert int(sy[k]) == expect, f"DFT mismatch at k={k}"
    log("ntt correctness gate passed")

    dt = timeit(lambda: fwd(x), iters=10)
    elems_per_s = batch * n / dt
    rep = roofline.KernelReport(
        f"ntt 2^20 x{batch}", dt, **roofline.ntt_cost(n, batch)
    )
    log(rep.line(), f"-> {elems_per_s:,.0f} elems/s")
    return elems_per_s


def bench_poseidon_merkle():
    from eigen_zeth_tpu.models import merkle
    from eigen_zeth_tpu.ops import goldilocks as gl
    from eigen_zeth_tpu.ops import poseidon
    from eigen_zeth_tpu.utils import roofline

    n = 1 << 16  # BASELINE config 2: 2^16 leaves
    rng = np.random.default_rng(1)
    leaves = gl.random_gf((n, 8), rng)

    # correctness gate vs host on a few rows
    got = gl.to_int(poseidon.hash_elements(gl.from_int(gl.to_int(leaves)[:2])))
    for i in range(2):
        assert list(got[i]) == [
            v % gl.P
            for v in poseidon.hash_elements_host([int(x) for x in gl.to_int(leaves)[i]])
        ], "poseidon host/device mismatch"
    log("poseidon correctness gate passed")

    digests = jax.jit(poseidon.hash_elements)
    dt_leaf = timeit(lambda: digests(leaves), iters=3)
    n_perms = n  # one permutation per 8-elem leaf
    rep = roofline.KernelReport(
        "poseidon leaf hash 2^16", dt_leaf, **roofline.poseidon_cost(n_perms)
    )
    log(rep.line(), f"-> {n / dt_leaf:,.0f} leaves/s")

    t0 = time.time()
    tree = merkle.commit_leaves(leaves, prefer_host=False)
    jax.block_until_ready(tree.levels[-1].lo)
    dt_tree = time.time() - t0
    log(f"merkle commit 2^16 leaves (leaf+tree, incl dispatch): {dt_tree:.2f}s "
        f"-> {n / dt_tree:,.0f} leaves/s")
    return n / dt_tree


def bench_mont_mul():
    from eigen_zeth_tpu.ops import bn254
    from eigen_zeth_tpu.ops.pallas.mont_pl import mont_mul_pallas
    from eigen_zeth_tpu.utils import roofline

    ctx = bn254.fq()
    n = 1 << 18
    rng = np.random.default_rng(2)
    base = [int.from_bytes(rng.bytes(40), "big") % bn254.Q for _ in range(256)]
    a = ctx.from_int(base * (n // 256))
    f = jax.jit(lambda x, y: mont_mul_pallas(ctx, x, y))
    got = ctx.to_int(f(a, a)[:, :256])
    assert all(int(got[i]) == base[i] * base[i] % bn254.Q for i in range(256)), "mont mismatch"
    log("mont_mul correctness gate passed")
    dt = timeit(lambda: f(a, a), iters=10)
    rep = roofline.KernelReport(
        "pallas mont_mul 2^18 (BN254)", dt, **roofline.mont_mul_cost(n)
    )
    log(rep.line(), f"-> {n / dt / 1e6:,.1f}M muls/s")
    return n / dt


def bench_msm(n_log2: int = 18, c: int = 8, serial: int = 32, window_group: int = 8):
    """BASELINE config 3: G1 MSM at 2^18 points.  Times the production
    shape — fixed points resident on device (an SRS/proving key), limb
    scalars in, one jitted dispatch (device digit extraction + sorted
    segmented bucket sums + affine windows), host Horner combine of the
    32 window points."""
    from eigen_zeth_tpu.ops import bn254, msm
    from eigen_zeth_tpu.ops.bn254 import G1_GEN, h_ec_mul

    n = 1 << n_log2
    rng = np.random.default_rng(3)
    scalars = [int.from_bytes(rng.bytes(40), "big") % bn254.R for _ in range(n)]
    pts = msm._g1_device_points([G1_GEN] * n)
    limbs = jnp.asarray(msm.scalar_limbs(scalars))

    def run():
        ax, ay, inf_d = msm._msm_pipeline_jit(False, pts, limbs, c, serial, window_group)
        jax.block_until_ready(ax)
        return ax, ay, np.asarray(inf_d)

    t0 = time.time()
    ax, ay, inf = run()
    log(f"msm first call (compile+run): {time.time() - t0:.1f}s")

    # correctness gate: full result (windows + host Horner) vs host scalar mul
    F = bn254.FqOps()
    xs, ys = F.to_int(ax), F.to_int(ay)
    windows = [
        None if inf[w] else (int(xs[w]), int(ys[w])) for w in range(len(inf))
    ]
    got = msm._host_horner(windows, c)
    assert got == h_ec_mul(sum(scalars) % bn254.R, G1_GEN), "MSM mismatch"
    log("msm correctness gate passed")

    dt = timeit(run, iters=3)
    log(
        f"g1 msm 2^{n_log2} (device pipeline, c={c}, serial={serial}, wg={window_group}):"
        f" {dt * 1e3:9.2f} ms -> {n / dt:,.0f} points/s"
    )
    return n / dt


def bench_fri_fold():
    from eigen_zeth_tpu.models import fri
    from eigen_zeth_tpu.ops import goldilocks as gl

    n = 1 << 22  # BASELINE config 4 polynomial size
    rng = np.random.default_rng(4)
    evals = gl.random_gf((n,), rng)
    f = jax.jit(lambda e: fri.fold_layer(e, 12345, gl.MULTIPLICATIVE_GENERATOR))
    dt = timeit(lambda: f(evals), iters=5)
    log(f"fri fold 2^22:                 {dt * 1e3:9.2f} ms -> {n / dt:,.0f} elems/s")
    return n / dt


BASELINE_MSM_POINTS_PER_S = float(1 << 20)  # BASELINE config 3 target


def main() -> None:
    full = "--full" in sys.argv
    elems_per_s = bench_ntt()
    msm_per_s = bench_msm()
    if full:
        bench_poseidon_merkle()
        bench_mont_mul()
        bench_fri_fold()
    print(
        json.dumps(
            {
                "metric": "goldilocks_ntt_2e20_throughput_per_chip",
                "value": round(elems_per_s),
                "unit": "elems/s",
                "vs_baseline": round(elems_per_s / BASELINE_NTT_ELEMS_PER_S, 3),
                "extra": {
                    "msm_g1_2e18_points_per_s": round(msm_per_s),
                    "msm_vs_baseline_2e20_per_s": round(
                        msm_per_s / BASELINE_MSM_POINTS_PER_S, 3
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
