"""Measure the chip's achievable uint32 elementwise throughput (VPU peak).

The roofline's VPU ceiling was an estimate ("published material does not
give an exact int32 figure" — utils/roofline.py); VERDICT r4 weak #8
asked for a measured bound so SoL% claims carry a defensible error bar.

Measurement design — three pitfalls, each hit and fixed while tuning
this probe on the real chip:
  * an AFFINE ladder (v*c + d) collapses under XLA's algebraic
    simplifier into one fused multiply-add (first attempt read an
    impossible 2900 Tops/s) — the body must be data-dependent
    (v*v + i), which no rewrite can fold;
  * `lax.fori_loop` bodies round-trip HBM every iteration, so a looped
    ladder measures HBM bandwidth (0.82 ms/step over 2^26 u32 = exactly
    the 819 GB/s roofline), not the VPU — the ladder must be UNROLLED
    in Python so XLA fuses all steps into one elementwise kernel;
  * under the axon remote backend a ~25 ms dispatch RTT swamps small
    kernels — each kernel reduces to a scalar (jnp.max, 4-byte fetch)
    and the probe times two unroll depths U1 < U2, dividing the op
    delta by the time delta so RTT/reduce/HBM terms cancel.

Measured 2026-08-20 (v5e behind axon): U=128 28.53 ms, U=384 43.39 ms
over 2^24 elems -> 0.578 T logical u32 ops/s.  "Logical" because a
32-bit integer multiply decomposes into several native VPU ops; kernel
cost models count the same logical ops, so this is the correct SoL
denominator.  utils/roofline.py V5E.vpu_ops pins this number.

Run on the TPU:  python scripts/measure_vpu.py
stdout: one JSON line {"vpu_u32_ops_per_s": ...}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def make_ladder(u: int):
    @jax.jit
    def f(v):
        a = v
        for i in range(u):
            a = a * a + jnp.uint32(i)
        return jnp.max(a)

    return f


def main() -> None:
    n = 1 << 24
    u1, u2 = 128, 384
    x = jnp.arange(n, dtype=jnp.uint32)
    f1, f2 = make_ladder(u1), make_ladder(u2)
    for f in (f1, f2):
        t0 = time.time()
        jax.device_get(f(x))
        print(f"compile+run: {time.time() - t0:.1f}s", file=sys.stderr)

    def best(fn, iters=8):
        b = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.device_get(fn())
            b = min(b, time.perf_counter() - t0)
        return b

    t1 = best(lambda: f1(x))
    t2 = best(lambda: f2(x))
    d_ops = n * (u2 - u1) * 2  # mul + add per element per extra step
    vpu = d_ops / max(t2 - t1, 1e-9)
    print(
        f"U={u1}: {t1*1e3:.2f} ms, U={u2}: {t2*1e3:.2f} ms"
        f" -> {vpu/1e12:.3f} T logical u32 ops/s",
        file=sys.stderr,
    )
    print(json.dumps({
        "vpu_u32_ops_per_s": round(vpu), "n": n, "u1": u1, "u2": u2,
    }))


if __name__ == "__main__":
    main()
