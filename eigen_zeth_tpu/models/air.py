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
    """Vectorized Goldilocks ops over the LDE coset (GF arrays).

    Constraint FAMILIES (arity k) stack a leading axis: values are
    (k, m) GF arrays; the scalar entry points broadcast.  Writing the
    12-lane Poseidon round as ONE family with a broadcasted MDS multiply
    keeps the XLA graph ~100x smaller than per-lane constraints (the
    per-lane form took XLA CPU >12 min to compile)."""

    batched = True

    def __init__(self, shape):
        self.shape = tuple(shape)

    def c(self, v: int) -> GF:
        return gl.full((), v % gl.P)

    def full(self, v: int) -> GF:
        """Constant broadcast to the evaluation shape (stackable)."""
        return gl.full(self.shape, v % gl.P)

    def add(self, a, b):
        return gl.add(a, b)

    def sub(self, a, b):
        return gl.sub(a, b)

    def mul(self, a, b):
        return gl.mul(a, b)

    def stack(self, parts):
        return gl.stack(list(parts), axis=0)

    def concat0(self, parts):
        def as2d(x):
            return x if x.lo.ndim > 1 else GF(x.lo[None], x.hi[None])

        return gl.concatenate([as2d(p) for p in parts], axis=0)

    def zeros(self, k):
        return gl.zeros((k,) + tuple(self.shape))

    def get0(self, x, i):
        return GF(x.lo[i], x.hi[i])

    def slice0(self, x, a, b):
        return GF(x.lo[a:b], x.hi[a:b])

    def sum0(self, x):
        """Log-depth pairwise field-add reduction over the leading axis."""
        k = x.lo.shape[0]
        while k > 1:
            if k % 2:
                pad = [(0, 1)] + [(0, 0)] * (x.lo.ndim - 1)
                x = GF(jnp.pad(x.lo, pad), jnp.pad(x.hi, pad))
                k += 1
            a = GF(x.lo[0::2], x.hi[0::2])
            b = GF(x.lo[1::2], x.hi[1::2])
            x = gl.add(a, b)
            k //= 2
        return GF(x.lo[0], x.hi[0])

    def const_matrix(self, rows) -> GF:
        """(r, c) matrix of field constants (for broadcasted matvecs)."""
        return gl.from_int_np(np.asarray(rows, dtype=np.uint64))

    def scale_rows(self, vec: GF, x) -> GF:
        """(k,) constant vector x one m-shaped value -> (k, m) family."""
        return gl.mul(GF(vec.lo[:, None], vec.hi[:, None]), x)

    def matvec(self, mat: GF, x: GF) -> GF:
        """(r, c) const matrix x (c, m) values -> (r, m): one broadcasted
        multiply + a log-depth reduction (MXU/VPU-friendly)."""
        prod = gl.mul(
            GF(mat.lo[:, :, None], mat.hi[:, :, None]),
            GF(x.lo[None, :, :], x.hi[None, :, :]),
        )  # (r, c, m)
        t = GF(jnp.moveaxis(prod.lo, 1, 0), jnp.moveaxis(prod.hi, 1, 0))
        return self.sum0(t)  # reduce the c axis -> (r, m)


class HostAlg:
    """The same vector algebra on host numpy uint64 (verifier-side): every
    value is a canonical-residue np.uint64 scalar or array, so family
    constraints evaluate identically at a query point."""

    batched = False

    def c(self, v: int):
        return np.uint64(v % gl.P)

    def full(self, v: int):
        return np.uint64(v % gl.P)

    def add(self, a, b):
        return gl.np_addmod(a, b)

    def sub(self, a, b):
        return gl.np_submod(a, b)

    def mul(self, a, b):
        return gl.np_mulmod(a, b)

    def stack(self, parts):
        return np.stack([np.asarray(p, dtype=np.uint64) for p in parts])

    def concat0(self, parts):
        return np.concatenate(
            [np.atleast_1d(np.asarray(p, dtype=np.uint64)) for p in parts]
        )

    def zeros(self, k):
        return np.zeros((k,), dtype=np.uint64)

    def get0(self, x, i):
        return x[i]

    def slice0(self, x, a, b):
        return x[a:b]

    def sum0(self, x):
        acc = np.zeros_like(x[0])
        for i in range(x.shape[0]):
            acc = gl.np_addmod(acc, x[i])
        return acc

    def const_matrix(self, rows):
        return np.asarray(rows, dtype=np.uint64)

    def scale_rows(self, vec, x):
        return gl.np_mulmod(vec, x)

    def matvec(self, mat, x):
        return np.stack(
            [self.sum0(gl.np_mulmod(mat[i], x)) for i in range(mat.shape[0])]
        )


@dataclass
class Constraint:
    """fn(alg, cur, nxt, per) -> constraint value(s).

    cur/nxt: indexable views of the trace columns at x and w·x.
    per: indexable view of the periodic columns at x.
    domain: 'transition' vanishes on H \\ {last row}; 'all' on all of H.
    arity: >1 means fn returns a STACKED family of constraints (leading
    axis k) — each member gets its own alpha."""

    name: str
    fn: Callable
    domain: str = "transition"
    arity: int = 1


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

    def fri_params(self, num_queries: int = 30, grind_bits: int = 0) -> fri.FriParams:
        # FRI degree-bound ratio: the composition has degree < 2n and is
        # committed on the ext_blowup·n coset, so the honest ratio is
        # ext_blowup/2 (= 4 at the default B=8; the wrap profile raises
        # B to trade prover LDE size for conjectured bits/query)
        return fri.FriParams(
            blowup=self.ext_blowup // 2,
            num_queries=num_queries,
            terminal_size=64,
            grind_bits=grind_bits,
        )

    # -- circuit-constant caches ---------------------------------------------

    def periodic_lde(self, shift: int) -> List[GF]:
        """LDE of each tiled periodic pattern on the shift·H_m coset —
        ONE batched jitted INTT+LDE over all patterns (per-column eager
        dispatch costs thousands of tiny XLA compiles)."""
        if self._per_lde_cache is None:
            import jax

            tiled = np.stack(
                [
                    np.tile(np.asarray(p, dtype=np.uint64), self.n // len(p))
                    for p in self.periodic
                ]
            )  # (K, n)
            B = self.ext_blowup

            @jax.jit
            def f(x: GF) -> GF:
                return nttm.lde(nttm.intt_auto(x), B, shift)

            all_lde = f(gl.from_int(tiled))  # (K, m)
            self._per_lde_cache = [
                GF(all_lde.lo[k], all_lde.hi[k]) for k in range(len(self.periodic))
            ]
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


def _lde_jit(air: Air, shift: int):
    """Cached jitted batched INTT+LDE of the trace columns."""
    key = ("lde", shift)
    cache = air.__dict__.setdefault("_jit_cache", {})
    if key not in cache:
        import jax

        B = air.ext_blowup

        @jax.jit
        def f(cols: GF) -> GF:
            return nttm.lde(nttm.intt_auto(cols), B, shift)

        cache[key] = f
    return cache[key]


def _np_batch_inv(vals: np.ndarray) -> np.ndarray:
    """Host Montgomery batch inversion over canonical uint64 (one modexp)."""
    n = len(vals)
    prefix = np.ones(n + 1, dtype=np.uint64)
    for i in range(n):
        prefix[i + 1] = gl.np_mulmod(prefix[i], vals[i])
    total_inv = np.uint64(gl.h_inv(int(prefix[n])))
    out = np.zeros(n, dtype=np.uint64)
    acc = total_inv
    for i in range(n - 1, -1, -1):
        out[i] = gl.np_mulmod(acc, prefix[i])
        acc = gl.np_mulmod(acc, vals[i])
    return out


def _comp_aux_np(air: Air, shift: int, b_rows: tuple) -> tuple:
    """Host-precomputed coset denominators/factors for the composition
    (numpy).  These MUST enter any jit as arguments, not be computed
    inside it from iota: XLA's constant folder would evaluate the whole
    powers ladder + batch inversion in its slow HLO interpreter at
    compile time (observed >10 min compiles)."""
    key = ("aux", shift, b_rows)
    cache = air.__dict__.setdefault("_jit_cache", {})
    if key in cache:
        return cache[key]
    n, B = air.n, air.ext_blowup
    m = n * B
    w_m = gl.primitive_root_of_unity(m)
    x = gl.np_mulmod(gl.powers_np(w_m, m), np.uint64(shift % gl.P))
    # Z_H(x) = x^n - 1 on the coset has period B: shift^n*(w^n)^j - 1
    wn = gl.h_pow(w_m, n)
    zh_pat = np.array(
        [
            (gl.h_mul(gl.h_pow(shift, n), gl.h_pow(wn, j)) - 1) % gl.P
            for j in range(B)
        ],
        dtype=np.uint64,
    )
    zh_inv = np.tile(_np_batch_inv(zh_pat), m // B)
    w_last = gl.h_pow(gl.primitive_root_of_unity(n), n - 1)
    last_fac = gl.np_submod(x, np.uint64(w_last))
    b_inv_np = {}
    # one vectorized prefix/suffix batch inversion per boundary row
    for r in b_rows:
        den = gl.np_submod(x, np.uint64(gl.h_pow(gl.primitive_root_of_unity(n), r)))
        # log-doubling cumulative product
        cum = den.copy()
        shift_k = 1
        while shift_k < m:
            shifted = np.ones(m, dtype=np.uint64)
            shifted[shift_k:] = cum[:-shift_k]
            cum = gl.np_mulmod(cum, shifted)
            shift_k *= 2
        total_inv = np.uint64(gl.h_inv(int(cum[-1])))
        # suffix product of elements AFTER i: cum_all / cum[i] — compute via
        # reversed log-doubling instead of division
        rcum = den[::-1].copy()
        shift_k = 1
        while shift_k < m:
            shifted = np.ones(m, dtype=np.uint64)
            shifted[shift_k:] = rcum[:-shift_k]
            rcum = gl.np_mulmod(rcum, shifted)
            shift_k *= 2
        suffix = rcum[::-1]  # product of den[i:]
        prefix_excl = np.ones(m, dtype=np.uint64)
        prefix_excl[1:] = cum[:-1]
        suffix_excl = np.ones(m, dtype=np.uint64)
        suffix_excl[:-1] = suffix[1:]
        b_inv_np[r] = gl.np_mulmod(
            gl.np_mulmod(prefix_excl, suffix_excl), total_inv
        )
    out = (zh_inv, last_fac, b_inv_np)
    cache[key] = out
    return out


def _comp_aux(air: Air, shift: int, b_rows: tuple) -> tuple:
    """Device-resident view of _comp_aux_np (jit inputs, not literals)."""
    key = ("aux-dev", shift, b_rows)
    cache = air.__dict__.setdefault("_jit_cache", {})
    if key in cache:
        return cache[key]
    zh_inv, last_fac, b_inv_np = _comp_aux_np(air, shift, b_rows)
    out = (
        gl.from_int(zh_inv),
        gl.from_int(last_fac),
        {r: gl.from_int(v) for r, v in b_inv_np.items()},
    )
    cache[key] = out
    return out


def _unavailable_native() -> bool:
    try:
        from ..native import poseidon2 as nps

        return not nps.available()
    except Exception:
        return True


def _native_tree(rows_np: np.ndarray):
    from ..native import poseidon2 as nps

    digests = nps.hash_elements(np.ascontiguousarray(rows_np))
    levels = [gl.from_int_np(digests)]
    for lv in nps.tree(digests):
        levels.append(gl.from_int_np(lv))
    return merkle.MerkleTree(levels=levels)


def _np_lde_cols(cols: np.ndarray, B: int, shift: int) -> np.ndarray:
    """Numpy INTT+LDE of (K, n) rows -> (K, n*B) coset evaluations —
    bit-identical to the jitted nttm.lde(nttm.intt_auto(x), B, shift)."""
    cols = np.atleast_2d(np.asarray(cols, dtype=np.uint64))
    K, n = cols.shape
    m = n * B
    sp = gl.powers_np(shift, n)
    out = np.empty((K, m), dtype=np.uint64)
    for k in range(K):
        coeffs = gl.np_intt(cols[k])
        padded = np.zeros(m, dtype=np.uint64)
        padded[:n] = gl.np_mulmod(coeffs, sp)
        out[k] = gl.np_ntt(padded)
    return out


def _periodic_lde_np(air: Air, shift: int) -> list:
    """Numpy twin of Air.periodic_lde (per-pattern (m,) coset values)."""
    key = ("per-np", shift)
    cache = air.__dict__.setdefault("_jit_cache", {})
    if key not in cache:
        tiled = np.stack(
            [
                np.tile(np.asarray(p, dtype=np.uint64), air.n // len(p))
                for p in air.periodic
            ]
        ) if air.periodic else np.zeros((0, air.n), dtype=np.uint64)
        lde = _np_lde_cols(tiled, air.ext_blowup, shift)
        cache[key] = [lde[k] for k in range(lde.shape[0])]
    return cache[key]


class _NpVecAlg:
    """DevAlg's exact semantics on numpy uint64 over the full (m,)
    domain (round 5): constraint families are (k, m) arrays with the
    domain on the LAST axis so numpy broadcasting matches the device
    layout.  HostAlg stays the scalar (query-point) backend."""

    batched = True

    def __init__(self, m: int):
        self.m = m

    def c(self, v: int):
        return np.uint64(v % gl.P)

    def full(self, v: int):
        return np.full((self.m,), v % gl.P, dtype=np.uint64)

    def add(self, a, b):
        return gl.np_addmod(a, b)

    def sub(self, a, b):
        return gl.np_submod(a, b)

    def mul(self, a, b):
        return gl.np_mulmod(a, b)

    def stack(self, parts):
        return np.stack([np.asarray(p, dtype=np.uint64) for p in parts])

    def concat0(self, parts):
        def as2d(x):
            x = np.asarray(x, dtype=np.uint64)
            return x if x.ndim > 1 else x[None]

        return np.concatenate([as2d(p) for p in parts], axis=0)

    def zeros(self, k):
        return np.zeros((k, self.m), dtype=np.uint64)

    def get0(self, x, i):
        return x[i]

    def slice0(self, x, a, b):
        return x[a:b]

    def sum0(self, x):
        acc = np.zeros(x.shape[1:], dtype=np.uint64)
        for i in range(x.shape[0]):
            acc = gl.np_addmod(acc, x[i])
        return acc

    def const_matrix(self, rows):
        return np.asarray(rows, dtype=np.uint64)

    def scale_rows(self, vec, x):
        vec = np.asarray(vec, dtype=np.uint64)
        return gl.np_mulmod(vec[:, None], x)

    def matvec(self, mat, x):
        prod = gl.np_mulmod(mat[:, :, None], np.asarray(x, dtype=np.uint64)[None])
        acc = np.zeros((mat.shape[0], x.shape[-1]), dtype=np.uint64)
        for j in range(mat.shape[1]):
            acc = gl.np_addmod(acc, prod[:, j])
        return acc


def _composition_np(air: Air, shift: int, b_struct: tuple):
    """Numpy twin of _composition_jit: the same constraint families
    evaluated through HostAlg over full-domain (m,) arrays.  ZERO XLA
    compiles — the default on CPU backends (where XLA compile time on
    the AIR graphs dominated the round-4 test suite) and for node-scale
    aggregation on the remote-compile TPU backend."""
    key = ("comp-np", shift, b_struct)
    cache = air.__dict__.setdefault("_jit_cache", {})
    if key in cache:
        return cache[key]
    n, B, C = air.n, air.ext_blowup, air.n_cols
    m = n * B
    b_rows = tuple(sorted({r for _, r in b_struct}))
    zh_inv, last_fac, b_inv = _comp_aux_np(air, shift, b_rows)
    per = _periodic_lde_np(air, shift)
    offs = []
    off = 0
    for c in air.constraints:
        offs.append(off)
        off += c.arity
    n_con_alphas = off
    alg = _NpVecAlg(m)

    def run(lde_np: np.ndarray, alphas: list, bvals: list) -> np.ndarray:
        cur = [lde_np[c] for c in range(C)]
        nxt = [np.roll(v, -B) for v in cur]
        comp = np.zeros(m, dtype=np.uint64)
        for c, off in zip(air.constraints, offs):
            v = c.fn(alg, cur, nxt, per)
            if c.domain == "transition":
                q = gl.np_mulmod(gl.np_mulmod(v, last_fac), zh_inv)
            elif c.domain == "all":
                q = gl.np_mulmod(v, zh_inv)
            else:
                raise ValueError(f"unknown constraint domain {c.domain!r}")
            if c.arity == 1:
                comp = gl.np_addmod(
                    comp, gl.np_mulmod(q, np.uint64(alphas[off]))
                )
            else:
                a_k = np.asarray(
                    alphas[off : off + c.arity], dtype=np.uint64
                )[:, None]
                comp = gl.np_addmod(comp, alg.sum0(gl.np_mulmod(q, a_k)))
        for j, (col, row) in enumerate(b_struct):
            v = gl.np_submod(cur[col], np.uint64(bvals[j] % gl.P))
            q = gl.np_mulmod(v, b_inv[row])
            comp = gl.np_addmod(
                comp, gl.np_mulmod(q, np.uint64(alphas[n_con_alphas + j]))
            )
        return comp

    cache[key] = run
    return run


GROUP_SIZE = 3  # constraints per composition sub-graph (XLA CPU compile
# time grows superlinearly with constraint count per module: 3 cons ≈ 2s,
# 10 cons ≈ 90s — measured on the recursion verifier AIR)


def _composition_jit(air: Air, shift: int, b_struct: tuple):
    """Cached jitted constraint composition: a handful of small jitted
    sub-graphs (GROUP_SIZE constraints each) summed on device, plus one
    stacked boundary-quotient family."""
    key = ("comp", shift, b_struct)
    cache = air.__dict__.setdefault("_jit_cache", {})
    if key in cache:
        return cache[key]
    import jax

    n, B, C = air.n, air.ext_blowup, air.n_cols
    m = n * B
    b_rows = tuple(sorted({r for _, r in b_struct}))
    zh_inv, last_fac, b_inv = _comp_aux(air, shift, b_rows)
    per = air.periodic_lde(shift)
    # stacked boundary data: inverse denominators + column gather order
    b_cols = [col for col, _ in b_struct]
    if b_struct:
        b_inv_stk = gl.stack([b_inv[row] for _, row in b_struct], axis=0)

    offs = []
    off = 0
    for c in air.constraints:
        offs.append(off)
        off += c.arity
    n_con_alphas = off

    def make_group(cons_off):
        @jax.jit
        def g(lde_cols: GF, alphas: GF, zh_inv: GF, last_fac: GF, per):
            alg = DevAlg((m,))
            cur = [GF(lde_cols.lo[c], lde_cols.hi[c]) for c in range(C)]
            nxt = [GF(jnp.roll(v.lo, -B), jnp.roll(v.hi, -B)) for v in cur]
            comp = gl.zeros((m,))
            for c, off in cons_off:
                v = c.fn(alg, cur, nxt, per)  # (m,) or (arity, m)
                if c.domain == "transition":
                    q = gl.mul(gl.mul(v, last_fac), zh_inv)
                elif c.domain == "all":
                    q = gl.mul(v, zh_inv)
                else:
                    raise ValueError(f"unknown constraint domain {c.domain!r}")
                if c.arity == 1:
                    a_i = gl.take(alphas, off)
                    comp = gl.add(comp, gl.mul(q, GF(a_i.lo[None], a_i.hi[None])))
                else:
                    a_k = GF(
                        alphas.lo[off : off + c.arity, None],
                        alphas.hi[off : off + c.arity, None],
                    )
                    comp = gl.add(comp, alg.sum0(gl.mul(q, a_k)))
            return comp

        return g

    pairs = list(zip(air.constraints, offs))
    groups = [
        make_group(tuple(pairs[i : i + GROUP_SIZE]))
        for i in range(0, len(pairs), GROUP_SIZE)
    ]

    @jax.jit
    def bound_family(lde_cols: GF, alphas: GF, bvals: GF, b_inv_stk: GF):
        alg = DevAlg((m,))
        rows = gl.stack(
            [GF(lde_cols.lo[c], lde_cols.hi[c]) for c in b_cols], axis=0
        )  # (n_b, m)
        v = gl.sub(rows, GF(bvals.lo[:, None], bvals.hi[:, None]))
        q = gl.mul(v, b_inv_stk)
        a_k = GF(
            alphas.lo[n_con_alphas :, None], alphas.hi[n_con_alphas :, None]
        )
        return alg.sum0(gl.mul(q, a_k))

    @jax.jit
    def add2(a: GF, b: GF) -> GF:
        return gl.add(a, b)

    def wrapper(lde_cols: GF, alphas: GF, bvals: GF) -> GF:
        comp = None
        for g in groups:
            part = g(lde_cols, alphas, zh_inv, last_fac, per)
            comp = part if comp is None else add2(comp, part)
        if b_struct:
            comp = add2(comp, bound_family(lde_cols, alphas, bvals, b_inv_stk))
        return comp

    cache[key] = wrapper
    return wrapper


def prove(
    air: Air,
    trace_rows: GF,
    publics: List[int],
    boundaries: List[Boundary],
    num_queries: int = 30,
    shift: int = gl.MULTIPLICATIVE_GENERATOR,
) -> dict:
    """Produce an AIR STARK proof for a (n, n_cols) trace."""
    import os as _os

    import jax as _jax

    n, C = trace_rows.lo.shape
    assert n == air.n and C == air.n_cols
    B = air.ext_blowup
    m = n * B
    # numpy mode (round 5): the full prover pipeline in numpy + the C++
    # hasher — ZERO XLA compiles.  Default on CPU backends (the jitted
    # AIR graphs' XLA CPU compiles dominated the round-4 suite) and for
    # node-scale traces on the remote-compile TPU backend (~30 ms/HLO-op
    # cold, docs/BENCH_NOTES.md).  EZT_FORCE_DEV_AIR pins the jitted
    # path (device-path tests); proofs are byte-identical (tested).
    np_mode = not _os.environ.get("EZT_FORCE_DEV_AIR") and (
        _jax.default_backend() == "cpu" or m <= (1 << 17)
    )

    if np_mode:
        cols_np = np.atleast_2d(gl.to_int(_columns(trace_rows)))
        lde_np = _np_lde_cols(cols_np, B, shift)  # (C, m)
        rows_np = lde_np.T  # (m, C)
        tree = merkle._commit_leaves_host(gl.from_int_np(rows_np)) \
            if _unavailable_native() else _native_tree(rows_np)
    else:
        lde_fn = _lde_jit(air, shift)
        lde_cols = lde_fn(_columns(trace_rows))  # (C, m)
        rows = GF(lde_cols.lo.T, lde_cols.hi.T)  # (m, C)
        # prefer_host auto-selects: native trees on accelerators, numpy
        # on the CPU test backend
        tree = merkle.commit_leaves(rows)

    transcript = Transcript(f"ezt-air/{air.name}")
    transcript.absorb("public", [len(publics)] + [int(v) % gl.P for v in publics])
    transcript.absorb(
        "boundary", [v for b in boundaries for v in (b.col, b.row, b.value % gl.P)]
    )
    transcript.absorb("trace-root", tree.root())
    n_alphas = sum(c.arity for c in air.constraints) + len(boundaries)
    alphas = transcript.challenges("alpha", n_alphas)

    # --- constraint composition --------------------------------------------
    b_struct = tuple((b.col, b.row) for b in boundaries)
    bvals = [b.value % gl.P for b in boundaries]
    if np_mode:
        comp = gl.from_int_np(
            _composition_np(air, shift, b_struct)(lde_np, alphas, bvals)
        )
    else:
        comp_fn = _composition_jit(air, shift, b_struct)
        alphas_gf = gl.from_int(np.array(alphas, dtype=np.uint64))
        bvals_gf = gl.from_int(np.array(bvals, dtype=np.uint64))
        comp = comp_fn(lde_cols, alphas_gf, bvals_gf)

    # --- FRI + trace openings ------------------------------------------------
    fri_out = fri.fri_prove(comp, shift, transcript, air.fri_params(num_queries))

    all_idx = []
    for jj in fri_out.layer0_indices:
        all_idx += [jj, (jj + B) % m, jj + m // 2, (jj + m // 2 + B) % m]
    idx_arr = np.asarray(all_idx, dtype=np.int64)
    if np_mode:
        row_vals = np.atleast_2d(rows_np[idx_arr])
    else:
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
    n_con_alphas = sum(c.arity for c in air.constraints)
    n_alphas = n_con_alphas + len(boundaries)
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
        off = 0
        for c in air.constraints:
            v = c.fn(alg, cur_vals, nxt_vals, per_vals)
            vals = (
                [int(x_) for x_ in np.atleast_1d(np.asarray(v, dtype=np.uint64))]
            )
            if len(vals) != c.arity:
                raise ValueError(f"{c.name}: arity mismatch")
            for i, vi in enumerate(vals):
                if c.domain == "transition":
                    q = vi * last_fac % gl.P * zh_inv % gl.P
                else:
                    q = vi * zh_inv % gl.P
                comp = (comp + alphas[off + i] * q) % gl.P
            off += c.arity
        for j, b in enumerate(boundaries):
            den = (x - gl.h_pow(w_n, b.row)) % gl.P
            q = (int(cur_vals[b.col]) - b.value) % gl.P * gl.h_inv(den) % gl.P
            comp = (comp + alphas[n_con_alphas + j] * q) % gl.P
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
