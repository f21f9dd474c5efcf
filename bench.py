"""Benchmark harness — headline: Goldilocks NTT throughput per chip.

stdout: the headline JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
printed immediately after the NTT section and RE-printed (enriched) after
every further section — the LAST line is the most complete result, and a
harness kill mid-section still leaves parseable output.  A global
deadline (EZT_BENCH_DEADLINE, default 1500 s) skips sections that no
longer fit, so the process exits 0 inside the driver's window.

Every run compiles COLD: the axon TPU backend cannot persist compiled
executables (jax's compilation cache reports "disabled/not initialized"
for the plugin — probed round 4), so each section's budget must cover
its own XLA compile.  That is why the proof-system sections use arity-8
FRI reduction (6 committed trees at 2^22 instead of 16 — ~5x smaller
fused program) and fri_fused.UNROLL_MIN is 64K: compile time is the
scarce resource, not device time (the 2^22 fused FRI runs in ~1-2 s but
compiled for 2888 s at arity 2).
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
# threshold MUST be 0: under the axon remote-compile plugin jax measures
# ~zero LOCAL compile time even for minutes-long remote compiles, so any
# positive min-compile-time filter silently suppresses every cache write
# (observed round 3: 98-388 s compiles, zero entries)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

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


def timeit_host(fn, iters=3):
    """Wall-clock for host-driven pipelines (their host sections already
    synchronize; no extra warm run — these take seconds per call)."""
    t0 = time.time()
    for _ in range(iters):
        fn()
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
    fwd = jax.jit(lambda x: nttm.ntt_four_step(x, plan_f))
    x = gl.random_gf((batch, n), rng)

    t0 = time.time()
    y = fwd(x)
    jax.block_until_ready(y)
    log(f"ntt first call (compile+run): {time.time() - t0:.1f}s")

    # correctness gate ON THE MEASURED KERNEL'S OUTPUT: full host-numpy
    # NTT of one batch row (vectorized bigint-free np_mulmod butterflies)
    # + a direct bigint DFT spot check at size 64.  No inverse-transform
    # compile: the axon backend compiles every program cold, and the old
    # round-trip gate's intt compile cost as much as the bench itself.
    want_row = gl.np_ntt(gl.to_int(x)[0])
    assert np.array_equal(gl.to_int(y)[0], want_row), "NTT mismatch vs host"
    small = 64
    want = gl.to_int(x)[0, :small]
    sy = gl.to_int(jax.jit(lambda v: nttm.ntt(v, nttm.make_plan(small)))(gl.from_int(want)))
    w = gl.primitive_root_of_unity(small)
    for k in [0, 1, small - 1]:
        expect = sum(int(want[j]) * pow(w, j * k, gl.P) for j in range(small)) % gl.P
        assert int(sy[k]) == expect, f"DFT mismatch at k={k}"
    log("ntt correctness gate passed (host np_ntt full-row + DFT spot)")

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


def _cached_test_points(n_log2: int):
    """gen_test_points with an on-disk cache (the device combine costs
    ~30 s at 2^18 — pure bench setup, not a measured kernel)."""
    import jax.numpy as jnp

    from eigen_zeth_tpu.ops import msm

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", ".")
    path = os.path.join(cache_dir, f"msm_points_{n_log2}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return (
            jnp.asarray(z["xs"]),
            jnp.asarray(z["ys"]),
            [int(d) for d in z["dlogs"]],  # decimal strings -> ints
        )
    xs, ys, dlogs = msm.gen_test_points(n_log2)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(path, xs=np.asarray(xs), ys=np.asarray(ys),
                 dlogs=np.asarray([str(d) for d in dlogs]))
    except Exception as e:  # pragma: no cover - cache is best-effort
        log(f"msm point cache write failed: {e!r}")
    return xs, ys, dlogs


def bench_msm(n_log2: int = 18, c: int = 13, serial: int = 32, window_group: int = 32):
    """BASELINE config 3 (target 2^20 points/s): G1 MSM over DISTINCT
    points.  Times the production shape — points resident on device (an
    SRS/proving key), limb scalars in, one jitted dispatch (device signed
    digit extraction + sorted segmented bucket sums via unsafe mixed adds
    + collision flag + affine windows), host Horner combine."""
    from eigen_zeth_tpu.ops import bn254, msm
    from eigen_zeth_tpu.ops.bn254 import G1_GEN, h_ec_mul

    n = 1 << n_log2
    t0 = time.time()
    xs, ys, dlogs = _cached_test_points(n_log2)
    log(f"msm point gen 2^{n_log2} (sqrt-size host sets + device combine): "
        f"{time.time() - t0:.1f}s")
    rng = np.random.default_rng(3)
    scalars = [int.from_bytes(rng.bytes(40), "big") % bn254.R for _ in range(n)]
    limbs = jnp.asarray(msm.scalar_limbs(scalars))
    inf = jnp.zeros((n,), bool)

    def run(read_back: bool = True):
        ax, ay, inf_w, bad = msm._msm_g1_fast_jit(
            xs, ys, inf, limbs, c, serial, window_group
        )
        if read_back:
            # force a true host read: block_until_ready does not reliably
            # block on the axon tunnel backend
            np.asarray(ax)
        return ax, ay, np.asarray(inf_w), np.asarray(bad)

    t0 = time.time()
    ax, ay, inf_w, bad = run()
    log(f"msm first call (compile+run): {time.time() - t0:.1f}s")
    assert not bool(bad), "collision flag on distinct points"

    # correctness gate: windows + host Horner vs ONE host scalar mul of G
    F = bn254.FqOps()
    xi, yi = F.to_int(ax), F.to_int(ay)
    windows = [
        None if inf_w[w] else (int(xi[w]), int(yi[w])) for w in range(len(inf_w))
    ]
    got = msm._host_horner(windows, c)
    want = h_ec_mul(sum(k * s for k, s in zip(dlogs, scalars)) % bn254.R, G1_GEN)
    assert got == want, "MSM mismatch"
    log("msm correctness gate passed")

    iters = 3
    t0 = time.time()
    for _ in range(iters - 1):
        run(read_back=False)
    run()  # final host read drains the dispatch queue
    dt = (time.time() - t0) / iters
    log(
        f"g1 msm 2^{n_log2} (fast device pipeline, c={c}, serial={serial}, "
        f"wg={window_group}): {dt * 1e3:9.2f} ms -> {n / dt:,.0f} points/s"
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


def bench_fri_full(n_log2: int = 22):
    """BASELINE config 4: the FULL FRI protocol (commit + open) on a 2^22
    constraint polynomial — every fold, every per-layer Merkle commit,
    transcript, terminal interpolation, and the 30 query openings.  (The
    round-1 bench timed a single fold op; VERDICT flagged that.)"""
    from eigen_zeth_tpu.models import fri
    from eigen_zeth_tpu.models.transcript import Transcript
    from eigen_zeth_tpu.ops import goldilocks as gl
    from eigen_zeth_tpu.ops import ntt as nttm

    # arity-8 reduction + the round-5 padded M-machine prover: shared
    # fixed-shape commit/fold/open programs (compiled once per process,
    # reused by the stark/e2e sections) — the axon backend cannot persist
    # executables and charges ~30 ms per HLO op per new program
    params = fri.FriParams(arity=8)
    rng = np.random.default_rng(7)

    m = 1 << n_log2
    coeffs = gl.random_gf((m // params.blowup,), rng)
    # ONE jitted setup program: the eager per-op LDE at 2^22 paid ~395 s
    # of remote compiles on the axon backend (round-5 measurement)
    lde_fn = jax.jit(
        lambda lo, hi: nttm.lde(
            gl.GF(lo, hi), params.blowup, gl.MULTIPLICATIVE_GENERATOR
        )
    )
    t0 = time.time()
    evals = lde_fn(coeffs.lo, coeffs.hi)
    jax.block_until_ready(evals.lo)
    log(f"fri setup LDE (jit compile+run): {time.time() - t0:.1f}s")

    def run():
        return fri.fri_prove(
            evals, gl.MULTIPLICATIVE_GENERATOR, Transcript("bench-fri"), params
        )

    t0 = time.time()
    out = run()
    log(f"fri full first call (compile+run): {time.time() - t0:.1f}s")

    # correctness gate ON THE MEASURED ARTIFACT: full host verification
    # of the 2^22 proof + tamper rejection.  (Stronger than the old
    # separate 2^14 round trip, and — critically — zero extra compiles:
    # the axon backend compiles every program cold, and the old gate's
    # second fused-program compile cost more than the measured section.)
    ok, _ = fri.fri_verify(out.proof, Transcript("bench-fri"), params)
    assert ok, "FRI round-trip failed"
    bad = json.loads(json.dumps(out.proof))
    bad["queries"][0]["layers"][0]["u"] = str(
        (int(bad["queries"][0]["layers"][0]["u"]) + 1) % gl.P
    )
    ok_bad, _ = fri.fri_verify(bad, Transcript("bench-fri"), params)
    assert not ok_bad, "FRI accepted a tampered opening"
    log("fri full-protocol correctness gate passed (2^22 verify + tamper)")

    dt = timeit_host(run, iters=1)
    log(
        f"fri commit+open 2^{n_log2} (full protocol, {params.num_queries} queries):"
        f" {dt:9.2f} s -> {m / dt:,.0f} elems/s"
    )
    return m / dt


def bench_stark_chunk(n_log2: int = 18):
    """Production-scale chunk STARK: a 2^18-row trace (VERDICT #3; the
    round-1 chunk traces were 128 rows).  Times prove_chunk end-to-end:
    trace build, INTT/LDE, trace Merkle commit at 2^20 leaves, constraint
    composition, full FRI, query openings."""
    from eigen_zeth_tpu.models import stark
    from eigen_zeth_tpu.ops import goldilocks as gl

    # fri_arity=8 (standalone chunk proofs — recursion keeps arity 2)
    params = stark.StarkParams(fri_arity=8)
    rng = np.random.default_rng(8)

    n = 1 << n_log2
    data = [int(x) for x in rng.integers(0, gl.P, size=n - 2, dtype=np.uint64)]

    def run():
        return stark.prove_chunk(data, iv=99, params=params)

    t0 = time.time()
    p = run()
    assert int(p["n"]) == n
    log(f"stark chunk first call (compile+run): {time.time() - t0:.1f}s")

    # correctness gate ON THE MEASURED ARTIFACT (full host verification
    # of the 2^18-row proof + tamper rejection; no extra compiles — the
    # axon backend compiles every program cold)
    assert stark.verify_chunk(p, params), "chunk STARK round-trip failed"
    bad = json.loads(json.dumps(p))
    bad["public"]["out"] = str((int(bad["public"]["out"]) + 1) % gl.P)
    assert not stark.verify_chunk(bad, params), "accepted tampered public output"
    log("chunk STARK correctness gate passed (2^18 verify + tamper)")
    dt = timeit_host(run, iters=1)
    log(
        f"chunk STARK prove, 2^{n_log2}-row trace (LDE 2^{n_log2 + 2}):"
        f" {dt:9.2f} s -> {n / dt:,.0f} trace rows/s"
    )
    return dt


def _run_e2e(prover, n_blocks: int):
    from eigen_zeth_tpu.protocol.messages import ProofResultCode

    blocks = list(range(1, n_blocks + 1))

    def run():
        r1 = prover.gen_batch_chunks("bench", blocks, chain_id=12345, program_name="evm")
        assert r1.result_code == ProofResultCode.COMPLETED_OK, r1.error_message
        r2 = prover.gen_chunk_proof(
            "bench", r1.task_id, r1.chunk_count, 12345, "evm", r1.batch_data
        )
        assert r2.result_code == ProofResultCode.COMPLETED_OK, r2.error_message
        # the client state machine aggregates first+last chunk proofs
        # (reference: src/prover/provider.rs:384-390)
        r3 = prover.gen_aggregated_proof(
            "bench", r2.chunk_proofs[0].proof, r2.chunk_proofs[-1].proof
        )
        assert r3.result_code == ProofResultCode.COMPLETED_OK, r3.error_message
        r4 = prover.gen_final_proof("bench", r3.result_string, "BN128", "0x" + "11" * 20)
        assert r4.result_code == ProofResultCode.COMPLETED_OK, r4.error_message
        return r1.chunk_count

    return run


def bench_e2e_batch(n_blocks: int = 7200):
    """BASELINE config 5: end-to-end batch proof wall-clock through the
    four ProverService steps (GenBatchChunks -> GenChunkProof [chunk
    STARKs] -> GenAggregatedProof -> GenFinalProof/Groth16), the same
    call sequence the node's proving state machine drives (reference:
    src/prover/provider.rs:276-540).  This tier runs the digest
    aggregation + MiMC Groth16 wrap (host MSMs — the circuit is ~1.3K
    constraints); the production stark-wrap tier is measured separately
    (e2e_prod_stark_wrap_wall_s) because its in-circuit verifier is
    orders of magnitude more work."""
    from eigen_zeth_tpu.protocol import prover_service as ps

    prover = ps.BatchProver(wrap="mimc", recursion=False, use_jit=False)
    run = _run_e2e(prover, n_blocks)
    t0 = time.time()
    chunk_count = run()
    dt0 = time.time() - t0
    log(f"e2e first call: {dt0:.1f}s ({chunk_count} chunks)")
    dt = timeit_host(run, iters=1)
    log(
        f"e2e batch proof ({n_blocks} blocks, {chunk_count} chunks, 4 steps"
        f" incl Groth16 wrap + self-verify): {dt:9.2f} s"
    )
    return dt


def bench_e2e_stark_wrap(n_blocks: int = 7200):
    """The PRODUCTION shape (VERDICT r4 item 2): 4096-row chunks, 32
    queries, fold-layer recursion, and the SOUND stark wrap — the Groth16
    circuit verifies the wrap-profile attestation STARKs in-circuit.
    Requires the CRS artifact (artifacts/crs) — generated once per
    deployment shape by BatchProver.ensure_wrap_crs, never inside
    gen_final_proof."""
    from eigen_zeth_tpu.protocol import prover_service as ps

    prover = ps.BatchProver(wrap="stark")
    run = _run_e2e(prover, n_blocks)
    t0 = time.time()
    chunk_count = run()
    dt = time.time() - t0
    log(f"e2e PRODUCTION stark-wrap ({n_blocks} blocks, {chunk_count} chunks): {dt:9.2f} s")
    return dt


BASELINE_MSM_POINTS_PER_S = float(1 << 20)  # BASELINE config 3 target


def main() -> None:
    """Bench contract (VERDICT r2 item 1): the headline JSON line prints
    immediately after the NTT section and is RE-printed, enriched, after
    every further section — the last line is the most complete, and a
    driver kill mid-section still leaves a parseable result.  A global
    deadline (EZT_BENCH_DEADLINE, default 1500 s — the round-3 driver run
    survived past 1650 s) skips sections that no longer fit so the
    process itself always exits 0.  The deadline clock starts AFTER the
    headline NTT section: TPU chip-claim latency under the tunnel is
    wildly variable (round 3 paid 1642 s on the first compile; the same
    program compiled in 15-99 s on other runs), and charging it against
    the later sections is what voided BENCH_r03's MSM/FRI/STARK fields."""
    full = "--full" in sys.argv
    deadline = float(os.environ.get("EZT_BENCH_DEADLINE", "1500"))
    elems_per_s = bench_ntt()
    t_start = time.time()  # post-headline: see docstring
    extra = {}

    def emit():
        print(
            json.dumps(
                {
                    "metric": "goldilocks_ntt_2e20_throughput_per_chip",
                    "value": round(elems_per_s),
                    "unit": "elems/s",
                    "vs_baseline": round(
                        elems_per_s / BASELINE_NTT_ELEMS_PER_S, 3
                    ),
                    "extra": extra,
                }
            ),
            flush=True,
        )

    emit()  # headline lands before any further (fail-soft) section

    def soft(name, fn, fmt=lambda v: round(v), budget_s=420):
        import signal as _sig

        # warm runs (make bench-warm) lift the per-section watchdog so a
        # long cold compile still lands in the persistent cache instead of
        # being SIGALRM'd out of it
        budget_s = float(os.environ.get("EZT_BENCH_SECTION_BUDGET", budget_s))
        remaining = deadline - (time.time() - t_start)
        budget = int(min(budget_s, remaining))
        if budget < 45:
            log(f"{name} SKIPPED: only {remaining:.0f}s of deadline left")
            extra[name] = None
            emit()
            return

        def _alarm(sig, frm):  # pragma: no cover - watchdog
            raise TimeoutError(f"{name} exceeded {budget}s")

        old = _sig.signal(_sig.SIGALRM, _alarm)
        _sig.alarm(budget)
        try:
            extra[name] = fmt(fn())
        except Exception as e:  # pragma: no cover - resilience path
            log(f"{name} FAILED: {e!r}")
            extra[name] = None
        finally:
            _sig.alarm(0)
            _sig.signal(_sig.SIGALRM, old)
        emit()

    soft("msm_g1_2e18_points_per_s", bench_msm, budget_s=300)
    if extra["msm_g1_2e18_points_per_s"]:
        extra["msm_vs_baseline_2e20_per_s"] = round(
            extra["msm_g1_2e18_points_per_s"] / BASELINE_MSM_POINTS_PER_S, 3
        )
    # stark before fri: both share the M-machine programs (whoever runs
    # first pays the one-time compile); the stark + e2e metrics have
    # never been captured (VERDICT r4 item 1) so they get first claim
    soft("stark_chunk_2e18_trace_wall_s", bench_stark_chunk,
         fmt=lambda v: round(v, 2), budget_s=750)
    soft("e2e_batch_proof_wall_s", bench_e2e_batch,
         fmt=lambda v: round(v, 2), budget_s=360)
    soft("fri_full_2e22_elems_per_s", bench_fri_full, budget_s=420)
    soft("e2e_prod_stark_wrap_wall_s", bench_e2e_stark_wrap,
         fmt=lambda v: round(v, 2), budget_s=420)
    if full:
        # scaling-efficiency artifact (BASELINE ">= 80% scaling report"):
        # committed SCALING.json (scripts/scaling_report.py on the
        # 8-virtual-device CPU mesh — real collective schedules, ICI wire
        # efficiency needs a real slice) is surfaced here; regenerate
        # with  python scripts/scaling_report.py 20 > SCALING.json
        scaling_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
        if os.path.exists(scaling_path):
            with open(scaling_path) as f:
                extra["scaling"] = json.load(f)
            emit()
        soft("merkle_2e16_leaves_per_s", bench_poseidon_merkle)
        soft("mont_mul_per_s", bench_mont_mul)
        soft("fri_fold_2e22_elems_per_s", bench_fri_fold)
    emit()


if __name__ == "__main__":
    main()
