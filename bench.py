"""Benchmark harness — headline: Goldilocks NTT throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference publishes no numbers; the target is
BASELINE.json's north-star of 2^24 NTT elements/s/chip.  vs_baseline is
therefore measured elements/s divided by 2^24.

Correctness is asserted in-line before timing (forward+inverse round trip
plus a spot check against the host bigint DFT on a small prefix), so a
fast-but-wrong kernel cannot post a number.

Run on the real TPU (the axon tunnel).  Supporting detail goes to stderr;
stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax

BASELINE_NTT_ELEMS_PER_S = float(1 << 24)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from eigen_zeth_tpu.ops import goldilocks as gl
    from eigen_zeth_tpu.ops import ntt as nttm

    n = 1 << 20
    batch = 4  # amortize dispatch; throughput counts all batch elements
    rng = np.random.default_rng(0xBE7C)

    plan_f = nttm.make_plan(n)
    plan_i = nttm.make_plan(n, inverse=True)

    fwd = jax.jit(lambda x: nttm.ntt(x, plan_f))
    inv = jax.jit(lambda x: nttm.intt(x, plan_i))

    x = gl.random_gf((batch, n), rng)

    t0 = time.time()
    y = fwd(x)
    jax.block_until_ready(y)
    log(f"first fwd (compile+run): {time.time() - t0:.1f}s")

    # --- correctness gate ---------------------------------------------------
    back = inv(y)
    jax.block_until_ready(back)
    got = gl.to_int(back)
    want = gl.to_int(x)
    assert np.array_equal(got, want), "NTT round-trip mismatch"
    # spot-check vs direct bigint DFT on a small transform
    small = 64
    sx = gl.from_int(want[0, :small])
    sy = gl.to_int(jax.jit(lambda v: nttm.ntt(v, nttm.make_plan(small)))(sx))
    w = gl.primitive_root_of_unity(small)
    for k in [0, 1, small - 1]:
        expect = sum(
            int(want[0, j]) * pow(w, j * k, gl.P) for j in range(small)
        ) % gl.P
        assert int(sy[k]) == expect, f"DFT mismatch at k={k}"
    log("correctness gate passed (round-trip + DFT spot check)")

    # --- timing -------------------------------------------------------------
    iters = 10
    t0 = time.time()
    out = x
    for _ in range(iters):
        out = fwd(out)
    jax.block_until_ready(out)
    dt = time.time() - t0
    elems_per_s = batch * n * iters / dt
    log(f"{iters} x batch={batch} NTT(2^20): {dt:.3f}s -> {elems_per_s:,.0f} elems/s")

    print(
        json.dumps(
            {
                "metric": "goldilocks_ntt_2e20_throughput_per_chip",
                "value": round(elems_per_s),
                "unit": "elems/s",
                "vs_baseline": round(elems_per_s / BASELINE_NTT_ELEMS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
