"""General AIR framework — multi-column traces, periodic columns,
degree-≤2 transition constraints, boundary constraints, proven with the
existing trace-LDE → constraint-composition → FRI pipeline.

This generalizes models/stark.py's hand-rolled two-column rolling-hash
AIR into the framework richer statements drop into — in particular the
recursive VERIFIER AIR (models/recursion.py) that re-executes a chunk
proof's query checks inside an aggregation STARK (the reference's
GenAggregatedProof semantics presume genuinely recursive proofs,
/root/reference/proto/prover/v1/prover.proto:115-119; round-1
aggregation was prover-local attestation — VERDICT item 6).

Design (TPU-first):
  * the trace is a dense (n_rows, n_cols) Goldilocks matrix; columns are
    interpolated/LDE'd in one batched NTT and committed as one Merkle
    tree over full rows — wide traces are nearly free on a vector
    machine, so programs favor MANY columns over long traces;
  * constraints are written once against a tiny algebra interface and
    evaluated twice: vectorized over the whole LDE coset on device
    (prover) and on host ints at the query points (verifier);
  * periodic columns (selectors, round constants) are circuit constants:
    the prover LDEs the tiled pattern; the verifier evaluates the
    degree-(L-1) interpolant at x^(n/L) — no commitment needed;
  * degree discipline: every constraint is degree ≤ 2 in trace columns
    and ≤ 1 overall extra from periodic factors, so the composition
    quotient has degree < 2n and FRI proves it on an 8n-point coset at
    ratio 4 (the same soundness point as the chunk STARK).

Verification is pure host math (numpy + python ints) — it must run
without a TPU.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import goldilocks as gl
from ..ops import ntt as nttm
from ..ops.goldilocks import GF
from . import fri, merkle
from .transcript import Transcript


# ---------------------------------------------------------------------------
# constraint algebra: one constraint definition, two evaluation backends


class DevAlg:
    """Vectorized Goldilocks ops over the LDE coset (GF arrays)."""

    def __init__(self, shape):
        self.shape = shape

    def c(self, v: int) -> GF:
        return gl.full(self.shape, v % gl.P)

    def add(self, a, b):
        return gl.add(a, b)

    def sub(self, a, b):
        return gl.sub(a, b)

    def mul(self, a, b):
        return gl.mul(a, b)


class HostAlg:
    """Scalar host ints mod P (verifier-side)."""

    def c(self, v: int) -> int:
        return v % gl.P

    def add(self, a, b):
        return (a + b) % gl.P

    def sub(self, a, b):
        return (a - b) % gl.P

    def mul(self, a, b):
        return (a * b) % gl.P


@dataclass
class Constraint:
    """fn(alg, cur, nxt, per) -> constraint value.

    cur/nxt: indexable views of the trace columns at x and w·x.
    per: indexable view of the periodic columns at x.
    domain: 'transition' vanishes on H \\ {last row}; 'all' on all of H."""

    name: str
    fn: Callable
    domain: str = "transition"


@dataclass
class Air:
    n: int
    n_cols: int
    periodic: List[np.ndarray]
    constraints: List[Constraint]
    name: str = "air"
    ext_blowup: int = 8  # LDE factor B; composition degree bound = 2n = Bn/4

    def __post_init__(self):
        assert self.n & (self.n - 1) == 0
        for p in self.periodic:
            L = len(p)
            assert L & (L - 1) == 0 and self.n % L == 0, "period must divide n"
        self._per_lde_cache = None
        self._per_interp_cache = None

    def fri_params(self, num_queries: int = 30) -> fri.FriParams:
        return fri.FriParams(blowup=4, num_queries=num_queries, terminal_size=64)

    # -- circuit-constant caches ---------------------------------------------

    def periodic_lde(self, shift: int) -> List[GF]:
        """LDE of each tiled periodic pattern on the shift·H_m coset."""
        if self._per_lde_cache is None:
            out = []
            for p in self.periodic:
                tiled = np.tile(np.asarray(p, dtype=np.uint64), self.n // len(p))
                coeffs = nttm.intt_auto(gl.from_int(tiled))
                out.append(nttm.lde(coeffs, self.ext_blowup, shift))
            self._per_lde_cache = out
        return self._per_lde_cache

    def periodic_interps(self) -> List[np.ndarray]:
        """Host coefficient vectors of each pattern over its period subgroup
        (value of column k at x is interp_k evaluated at x^(n/L_k))."""
        if self._per_interp_cache is None:
            self._per_interp_cache = [
                gl.np_intt(np.asarray(p, dtype=np.uint64)) for p in self.periodic
            ]
        return self._per_interp_cache

    def periodic_at(self, x: int) -> List[int]:
        """Evaluate every periodic column at one point (host)."""
        interps = self.periodic_interps()
        out = []
        for p, coeffs in zip(self.periodic, interps):
            z = gl.h_pow(x, self.n // len(p))
            acc = 0
            for c in reversed([int(v) for v in coeffs]):
                acc = (acc * z + c) % gl.P
            out.append(acc)
        return out

    def periodic_at_many(self, xs: Sequence[int]) -> np.ndarray:
        """(n_periodic, len(xs)) evaluations — vectorized Horner so the
        verifier's periodic work is numpy ops, not python bigints."""
        interps = self.periodic_interps()
        xs = list(xs)
        out = np.zeros((len(self.periodic), len(xs)), dtype=np.uint64)
        # group columns by period so each group shares the z powers
        by_len = {}
        for k, p in enumerate(self.periodic):
            by_len.setdefault(len(p), []).append(k)
        for L, ks in by_len.items():
            zs = np.array(
                [gl.h_pow(x, self.n // L) for x in xs], dtype=np.uint64
            )
            coeffs = np.stack([interps[k] for k in ks])  # (K, L)
            acc = np.zeros((len(ks), len(xs)), dtype=np.uint64)
            for i in range(L - 1, -1, -1):
                acc = gl.np_mulmod(acc, zs[None, :])
                acc = gl.np_addmod(acc, coeffs[:, i : i + 1])
            out[ks, :] = acc
        return out


@dataclass
class Boundary:
    """col(w^row) == value; value is instance data (public input)."""

    col: int
    row: int
    value: int


# ---------------------------------------------------------------------------
# prover


def _columns(trace_rows: GF) -> GF:
    """(n, C) rows -> (C, n) columns."""
    return GF(trace_rows.lo.T, trace_rows.hi.T)


def prove(
    air: Air,
    trace_rows: GF,
    publics: List[int],
    boundaries: List[Boundary],
    num_queries: int = 30,
    shift: int = gl.MULTIPLICATIVE_GENERATOR,
) -> dict:
    """Produce an AIR STARK proof for a (n, n_cols) trace."""
    n, C = trace_rows.lo.shape
    assert n == air.n and C == air.n_cols
    B = air.ext_blowup
    m = n * B

    # --- trace interpolation + LDE + commit (one batched NTT) --------------
    cols = _columns(trace_rows)  # (C, n)
    coeffs = nttm.intt_auto(cols)
    lde_cols = nttm.lde(coeffs, B, shift)  # (C, m)
    rows = GF(lde_cols.lo.T, lde_cols.hi.T)  # (m, C)
    tree = merkle.commit_leaves(rows, prefer_host=False)

    transcript = Transcript(f"ezt-air/{air.name}")
    transcript.absorb("public", [len(publics)] + [int(v) % gl.P for v in publics])
    transcript.absorb(
        "boundary", [v for b in boundaries for v in (b.col, b.row, b.value % gl.P)]
    )
    transcript.absorb("trace-root", tree.root())
    n_alphas = len(air.constraints) + len(boundaries)
    alphas = transcript.challenges("alpha", n_alphas)

    # --- constraint evaluation on the LDE coset -----------------------------
    alg = DevAlg((m,))
    cur = [GF(lde_cols.lo[c], lde_cols.hi[c]) for c in range(C)]
    nxt = [GF(jnp.roll(v.lo, -B), jnp.roll(v.hi, -B)) for v in cur]
    per = air.periodic_lde(shift)

    w_last = gl.h_pow(gl.primitive_root_of_unity(n), n - 1)
    x_arr = gl.mul(gl.powers(gl.primitive_root_of_unity(m), m), gl.full((m,), shift))
    zh = gl.sub(gl.pow_const(x_arr, n), gl.ones((m,)))

    # batch-invert every denominator at once
    b_rows = sorted({b.row for b in boundaries})
    dens = [zh] + [
        gl.sub(x_arr, gl.full((m,), gl.h_pow(gl.primitive_root_of_unity(n), r)))
        for r in b_rows
    ]
    den_inv = gl.batch_inv(gl.stack(dens, axis=0))
    zh_inv = gl.take(den_inv, 0, axis=0)
    b_inv = {r: gl.take(den_inv, 1 + i, axis=0) for i, r in enumerate(b_rows)}

    last_fac = gl.sub(x_arr, gl.full((m,), w_last))
    comp = gl.zeros((m,))
    for i, c in enumerate(air.constraints):
        v = c.fn(alg, cur, nxt, per)
        if c.domain == "transition":
            q = gl.mul(gl.mul(v, last_fac), zh_inv)
        elif c.domain == "all":
            q = gl.mul(v, zh_inv)
        else:
            raise ValueError(f"unknown constraint domain {c.domain!r}")
        comp = gl.add(comp, gl.mul(q, gl.full((m,), alphas[i])))
    for j, b in enumerate(boundaries):
        v = gl.sub(cur[b.col], gl.full((m,), b.value % gl.P))
        q = gl.mul(v, b_inv[b.row])
        comp = gl.add(comp, gl.mul(q, gl.full((m,), alphas[len(air.constraints) + j])))

    # --- FRI + trace openings ------------------------------------------------
    fri_out = fri.fri_prove(comp, shift, transcript, air.fri_params(num_queries))

    all_idx = []
    for jj in fri_out.layer0_indices:
        all_idx += [jj, (jj + B) % m, jj + m // 2, (jj + m // 2 + B) % m]
    idx_arr = np.asarray(all_idx, dtype=np.int64)
    row_vals = np.atleast_2d(gl.to_int(GF(rows.lo[idx_arr], rows.hi[idx_arr])))
    all_paths = tree.open_many(all_idx)
    openings = []
    for q in range(len(fri_out.layer0_indices)):
        rows_open = []
        for k in range(4):
            i = q * 4 + k
            rows_open.append(
                {
                    "index": int(all_idx[i]),
                    "row": [str(int(x)) for x in row_vals[i]],
                    "path": [[str(x) for x in p] for p in all_paths[i]],
                }
            )
        openings.append(rows_open)

    return {
        "version": 1,
        "air": air.name,
        "n": n,
        "n_cols": C,
        "ext_blowup": B,
        "shift": str(shift),
        "num_queries": num_queries,
        "publics": [str(int(v) % gl.P) for v in publics],
        "boundaries": [[b.col, b.row, str(b.value % gl.P)] for b in boundaries],
        "trace_root": [str(x) for x in tree.root()],
        "fri": fri_out.proof,
        "trace_openings": openings,
    }


# ---------------------------------------------------------------------------
# verifier (host-only)


def verify(
    air: Air,
    proof: dict,
    publics: List[int],
    boundaries: List[Boundary],
) -> bool:
    try:
        n = int(proof["n"])
        C = int(proof["n_cols"])
        B = int(proof["ext_blowup"])
        shift = int(proof["shift"])
        num_queries = int(proof["num_queries"])
        root = [int(x) for x in proof["trace_root"]]
        p_pub = [int(v) for v in proof["publics"]]
        p_bnd = [(int(c), int(r), int(v)) for c, r, v in proof["boundaries"]]
    except (KeyError, ValueError, TypeError):
        return False
    if n != air.n or C != air.n_cols or B != air.ext_blowup:
        return False
    # the proof must be FOR the instance the caller is checking
    if p_pub != [int(v) % gl.P for v in publics]:
        return False
    if p_bnd != [(b.col, b.row, b.value % gl.P) for b in boundaries]:
        return False
    m = n * B

    transcript = Transcript(f"ezt-air/{air.name}")
    transcript.absorb("public", [len(publics)] + [int(v) % gl.P for v in publics])
    transcript.absorb(
        "boundary", [v for b in boundaries for v in (b.col, b.row, b.value % gl.P)]
    )
    transcript.absorb("trace-root", root)
    n_alphas = len(air.constraints) + len(boundaries)
    alphas = transcript.challenges("alpha", n_alphas)

    ok, layer0 = fri.fri_verify(proof["fri"], transcript, air.fri_params(num_queries))
    if not ok or int(proof["fri"]["domain_size"]) != m:
        return False
    if len(proof["trace_openings"]) != len(layer0):
        return False

    w_m = gl.primitive_root_of_unity(m)
    w_n = gl.primitive_root_of_unity(n)
    w_last = gl.h_pow(w_n, n - 1)
    alg = HostAlg()

    # evaluate every periodic column at every needed point in one numpy pass
    xs = []
    for (jj, _, _) in layer0:
        x = gl.h_mul(shift, gl.h_pow(w_m, jj))
        xs += [x, (gl.P - x) % gl.P]
    per_all = air.periodic_at_many(xs)  # (K, 2Q)

    def composition_at(x, cur_vals, nxt_vals, per_vals) -> int:
        zh = (gl.h_pow(x, n) - 1) % gl.P
        zh_inv = gl.h_inv(zh)
        comp = 0
        last_fac = (x - w_last) % gl.P
        for i, c in enumerate(air.constraints):
            v = c.fn(alg, cur_vals, nxt_vals, per_vals)
            if c.domain == "transition":
                q = v * last_fac % gl.P * zh_inv % gl.P
            else:
                q = v * zh_inv % gl.P
            comp = (comp + alphas[i] * q) % gl.P
        for j, b in enumerate(boundaries):
            den = (x - gl.h_pow(w_n, b.row)) % gl.P
            q = (cur_vals[b.col] - b.value) % gl.P * gl.h_inv(den) % gl.P
            comp = (comp + alphas[len(air.constraints) + j] * q) % gl.P
        return comp

    for qi, (rows_open, (jj, u_val, v_val)) in enumerate(
        zip(proof["trace_openings"], layer0)
    ):
        if len(rows_open) != 4:
            return False
        expect_idx = [jj, (jj + B) % m, jj + m // 2, (jj + m // 2 + B) % m]
        vals = {}
        for entry, want_i in zip(rows_open, expect_idx):
            i = int(entry["index"])
            if i != want_i:
                return False
            row = [int(x) for x in entry["row"]]
            if len(row) != C:
                return False
            path = [[int(x) for x in p] for p in entry["path"]]
            if not merkle.verify_path(root, i, row, path):
                return False
            vals[i] = row
        x_u = gl.h_mul(shift, gl.h_pow(w_m, jj))
        x_v = (gl.P - x_u) % gl.P
        per_u = [int(v) for v in per_all[:, 2 * qi]]
        per_v = [int(v) for v in per_all[:, 2 * qi + 1]]
        c_u = composition_at(x_u, vals[jj], vals[(jj + B) % m], per_u)
        c_v = composition_at(
            x_v, vals[jj + m // 2], vals[(jj + m // 2 + B) % m], per_v
        )
        if c_u != u_val or c_v != v_val:
            return False
    return True
