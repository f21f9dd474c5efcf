"""FRI low-degree commitment — commit / open / verify.

The polynomial-commitment layer of the chunk prover (BASELINE config 4:
FRI commit/open on a 2^22 constraint polynomial; the reference performs
this inside its external prover service, SURVEY.md §2.9-bis).

Protocol (arity-schedule fold, coset domains):
  prover      D_0 = s·H_0 (|H_0| = blowup·deg-bound).  Committed layers
              follow FriParams.layer_schedule: layer 0 always commits
              pairwise — leaf j holds (f(x_j), f(-x_j)) so one opening
              authenticates both points and callers' layer-0 cross-checks
              keep their (jj, u, v) shape — later layers commit arity-A
              rows (leaf jj holds [f at jj + k·c for k < A]).
  each layer  β ← transcript;  then log2(A) binary folds with sub-level
              betas β, β², β⁴, …:  f_{i+1}(x²) = (f+f⁻)/2 + β·(f-f⁻)/(2x)
              (evaluations fold pairwise: one vectorized device op)
  terminal    remaining evaluations are interpolated (INTT) and the raw
              coefficients are absorbed — the verifier checks the degree
              bound directly on them.
  queries     indices ← transcript; per query, Merkle-opened sibling
              pairs at every layer; the verifier re-folds and compares,
              terminating against the final polynomial.

Prover compute (folds, Merkle levels) is bulk device work; the verifier
is pure host bigint math (it must run without a TPU).

Soundness: each query contributes ~log2(blowup) bits
(conjectured-regime), so num_queries=30 at blowup=4 targets ~60 bits —
round-1 parameterization, recorded in FriParams.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax.numpy as jnp
import numpy as np

from ..ops import goldilocks as gl
from ..ops import ntt as nttm
from ..ops.goldilocks import GF
from . import merkle
from .transcript import Transcript

INV2 = (gl.P + 1) // 2  # 1/2 mod p


@dataclass
class FriParams:
    blowup: int = 4
    num_queries: int = 30
    terminal_size: int = 64  # stop folding at this many evaluations
    # Reduction arity for layers AFTER the first (power of two).  Layer 0
    # always commits (f(x), f(-x)) pairs so callers' layer-0 cross-checks
    # (stark/air composition consistency) keep their (jj, u, v) shape.
    # Arity A > 2 folds log2(A) binary levels per committed Merkle tree
    # with sub-level betas β, β², β⁴, … (equivalent to the standard
    # Σ g_k β^k coefficient combination), cutting both the number of
    # trees the prover hashes and — decisively on TPU — the size of the
    # fused single-dispatch XLA program (plonky2-style reduction arity).
    # Recursion (the verifier AIR) consumes arity-2 proofs only; the
    # production chunk pipeline keeps arity=2, big standalone proofs use 8.
    # Soundness caveat (round-4 advisor): per-layer batching draws the
    # single challenge β (and its powers β..β^{A-1}) from the 64-bit
    # BASE field; plonky2 — whose reduction-arity pattern this follows —
    # samples FRI challenges from a degree-2 extension precisely because
    # the base field is small.  Arity > 2 widens the batching error term
    # (~(A-1)·deg/|F| per layer), so extension-field challenges are the
    # tracked fix before arity-8 proofs are relied on adversarially
    # (alongside the ~60-bit query-budget remark above).
    arity: int = 2
    # Proof-of-work grinding (EthSTARK-style): before query indices are
    # drawn the prover finds a nonce whose transcript challenge has
    # grind_bits low zero bits — each adds one conjectured soundness bit
    # (an attacker pays 2^g hash attempts per transcript trial).  Only
    # the Fr wrap pipeline implements it (air_wrap._fri_prove_fr and the
    # Groth16 gadget); the Goldilocks fri_prove path keeps g=0.
    grind_bits: int = 0

    @property
    def max_degree_ratio(self) -> int:
        return self.blowup

    def layer_schedule(self, m: int) -> List[int]:
        """Per-committed-layer arities for a size-m domain (deterministic
        from params — the verifier replays it)."""
        assert self.arity & (self.arity - 1) == 0 and self.arity >= 2
        out: List[int] = []
        size = m
        while size > self.terminal_size:
            a = 2 if not out else min(self.arity, size // self.terminal_size)
            out.append(a)
            size //= a
        return out


def fold_layer(evals: GF, beta: int, shift: int) -> GF:
    """One FRI fold on device: (m,) evaluations on s·H -> (m/2,) on s²·H²."""
    m = evals.lo.shape[-1]
    half = m // 2
    u = GF(evals.lo[..., :half], evals.hi[..., :half])
    v = GF(evals.lo[..., half:], evals.hi[..., half:])
    w_inv = gl.h_inv(gl.primitive_root_of_unity(m))
    x_inv = gl.powers(w_inv, half)  # device ladder (VERDICT: no host loop)
    s_inv = gl.h_inv(shift)
    x_inv = gl.mul(x_inv, gl.full(x_inv.lo.shape, s_inv))
    inv2 = gl.full(u.lo.shape, INV2)
    beta_arr = gl.full(u.lo.shape, beta)
    even = gl.mul(gl.add(u, v), inv2)
    odd = gl.mul(gl.mul(gl.mul(gl.sub(u, v), inv2), x_inv), beta_arr)
    return gl.add(even, odd)


_FOLD_PAD_PROG = None
_XINV_CACHE: dict = {}


def _pad_buffer_len() -> int:
    from . import merkle

    return 2 * merkle.PAD_ROWS


def _fold_xinv_padded(m: int, shift: int):
    """Device-resident (x_j)^-1 fold twiddles for size m, zero-padded to
    the shared buffer half-width.  Host-computed (vectorized np_mulmod),
    transferred once per (m, shift), reused every proof."""
    key = (m, shift % gl.P)
    if key not in _XINV_CACHE:
        import jax.numpy as jnp

        M = _pad_buffer_len()
        w_inv = gl.h_inv(gl.primitive_root_of_unity(m))
        s_inv = gl.h_inv(shift)
        xs = np.zeros(M // 2, dtype=np.uint64)
        xs[: m // 2] = gl.np_mulmod(gl.powers_np(w_inv, m // 2), np.uint64(s_inv))
        g = gl.from_int_np(xs)
        _XINV_CACHE[key] = GF(jnp.asarray(g.lo), jnp.asarray(g.hi))
    return _XINV_CACHE[key]


def _fold_pad_prog():
    """ONE shared fold program for every layer size: the (M,) buffer
    holds the live m-prefix; v_j = x[j + m/2] rides a runtime-scalar
    gather, so no layer shape ever recompiles (axon compile is ~30 ms
    per HLO op — per-shape fold programs cost ~a minute each)."""
    global _FOLD_PAD_PROG
    if _FOLD_PAD_PROG is not None:
        return _FOLD_PAD_PROG
    import jax
    import jax.numpy as jnp

    def run(xlo, xhi, m, blo, bhi, xinv_lo, xinv_hi):
        M = xlo.shape[0]
        half = M // 2
        j = jnp.arange(half, dtype=jnp.int32)
        vidx = (j + (m // 2).astype(jnp.int32)) & jnp.int32(M - 1)
        u = GF(xlo[:half], xhi[:half])
        v = GF(xlo[vidx], xhi[vidx])
        even = gl.mul_scalar(gl.add(u, v), INV2)
        odd = gl.mul(
            gl.mul(gl.mul_scalar(gl.sub(u, v), INV2), GF(xinv_lo, xinv_hi)),
            GF(jnp.broadcast_to(blo, u.lo.shape), jnp.broadcast_to(bhi, u.hi.shape)),
        )
        out = gl.add(even, odd)
        z = jnp.zeros((half,), jnp.uint32)
        return jnp.concatenate([out.lo, z]), jnp.concatenate([out.hi, z])

    _FOLD_PAD_PROG = jax.jit(run)
    return _FOLD_PAD_PROG


def _np_fold(x: np.ndarray, beta: int, shift: int) -> np.ndarray:
    """Host fold on uint64 numpy (small layers / CPU tails)."""
    m = len(x)
    half = m // 2
    u, v = x[:half], x[half:]
    w_inv = gl.h_inv(gl.primitive_root_of_unity(m))
    s_inv = gl.h_inv(shift)
    x_inv = gl.np_mulmod(gl.powers_np(w_inv, half), np.uint64(s_inv))
    inv2 = np.uint64(INV2)
    even = gl.np_mulmod(gl.np_addmod(u, v), inv2)
    odd = gl.np_mulmod(
        gl.np_mulmod(gl.np_mulmod(gl.np_submod(u, v), inv2), x_inv),
        np.uint64(beta % gl.P),
    )
    return gl.np_addmod(even, odd)


class _NpTree:
    """Host tree over (c, A) numpy leaf rows (C++ engine when available,
    numpy Poseidon otherwise) with the same open_with_rows surface as
    merkle.PaddedMerkleTree."""

    def __init__(self, vals: np.ndarray):
        self.vals = vals  # (c, A) uint64
        try:
            from ..native import poseidon2 as nps

            digests = nps.hash_elements(np.ascontiguousarray(vals))
            self.levels = [digests] + nps.tree(digests)
        except Exception:
            from ..ops import poseidon as ps

            level = ps.np_hash_elements(vals)
            self.levels = [level]
            while level.shape[0] > 1:
                level = ps.np_hash_two(level[0::2], level[1::2])
                self.levels.append(level)

    def root(self) -> list[int]:
        return [int(v) for v in self.levels[-1][0]]

    def open_with_rows(self, indices):
        idx = np.asarray(list(indices), dtype=np.int64)
        rows = self.vals[idx % self.vals.shape[0]]
        paths = []
        for j in idx:
            j = int(j) % self.vals.shape[0]
            path = []
            for li in range(len(self.levels) - 1):
                path.append([int(v) for v in self.levels[li][(j >> li) ^ 1]])
            paths.append(path)
        return rows, paths


def _fri_prove_padded(
    evals: GF, shift: int, transcript: Transcript, params: FriParams
) -> FriProverOutput:
    """The TPU layered prover: shared fixed-shape device programs for the
    big layers (merkle M-machine + one padded fold program), C++/numpy
    host work below NATIVE_MIN_LEAVES.  Proof bytes identical to the
    host-orchestrated path (same transcript, same trees)."""
    import jax
    import jax.numpy as jnp

    from . import merkle

    m = evals.lo.shape[-1]
    M = _pad_buffer_len()
    assert m <= M
    schedule = params.layer_schedule(m)

    cur_pad = None  # (M,) device planes
    cur_np = None  # uint64 numpy once on host
    if schedule and m // schedule[0] >= merkle.NATIVE_MIN_LEAVES:
        # device mode entry: pad once (one eager op per distinct m)
        cur_pad = (
            jnp.pad(evals.lo, (0, M - m)),
            jnp.pad(evals.hi, (0, M - m)),
        )
    else:
        cur_np = np.asarray(gl.to_int(evals), dtype=np.uint64)

    cur_m, cur_shift = m, shift
    layers = []  # (tree-like, c, A)
    roots, betas = [], []
    for A in schedule:
        c = cur_m // A
        if cur_pad is not None and c < merkle.NATIVE_MIN_LEAVES:
            # transition to host: slice the live prefix on device first
            # (one eager slice op per transition shape, compiled once —
            # pulling the whole padded buffer was a 32 MB transfer per
            # proof over the tunnel)
            cur_np = np.asarray(
                gl.to_int(GF(cur_pad[0][:cur_m], cur_pad[1][:cur_m])),
                dtype=np.uint64,
            )
            cur_pad = None
        if cur_pad is not None:
            tree = merkle.commit_evals_device(cur_pad, c, A)
        else:
            tree = _NpTree(
                np.ascontiguousarray(
                    cur_np.reshape(A, c).T
                )
            )
        root = tree.root()
        transcript.absorb("fri-root", root)
        beta = transcript.challenge("fri-beta")
        layers.append((tree, c, A))
        roots.append(root)
        betas.append(beta)
        b = beta
        for _ in range(A.bit_length() - 1):
            if cur_pad is not None:
                bg = gl.from_int(np.uint64(b % gl.P))
                xinv = _fold_xinv_padded(cur_m, cur_shift)
                cur_pad = _fold_pad_prog()(
                    cur_pad[0], cur_pad[1], jnp.int32(cur_m),
                    bg.lo, bg.hi, xinv.lo, xinv.hi,
                )
            else:
                cur_np = _np_fold(cur_np, b, cur_shift)
            cur_m //= 2
            cur_shift = gl.h_mul(cur_shift, cur_shift)
            b = gl.h_mul(b, b)

    # terminal: host interpolation (tiny)
    if cur_pad is not None:
        cur_np = np.asarray(
            gl.to_int(GF(cur_pad[0][:cur_m], cur_pad[1][:cur_m])),
            dtype=np.uint64,
        )
    tsize = cur_m
    coeffs_shifted = gl.np_intt(cur_np)
    s_inv = gl.h_inv(cur_shift)
    final_coeffs, si = [], 1
    for co in coeffs_shifted:
        final_coeffs.append(gl.h_mul(int(co), si))
        si = gl.h_mul(si, s_inv)
    keep = tsize // params.blowup
    assert all(co == 0 for co in final_coeffs[keep:]), "terminal degree too high"
    final_coeffs = final_coeffs[:keep]
    transcript.absorb("fri-final", final_coeffs)

    indices = transcript.challenge_indices("fri-query", params.num_queries, m // 2)
    per_layer = []
    js = np.asarray(indices, dtype=np.int64)
    for tree, c, A in layers:
        jj = js % c
        rows, paths = tree.open_with_rows(jj)
        per_layer.append((np.atleast_2d(rows), paths))
        js = jj
    queries = []
    for q, idx in enumerate(indices):
        layer_openings = []
        for (rows, paths) in per_layer:
            path = [[str(x) for x in d] for d in paths[q]]
            if rows.shape[1] == 2:
                o = {"u": str(int(rows[q][0])), "v": str(int(rows[q][1])),
                     "path": path}
            else:
                o = {"vals": [str(int(x)) for x in rows[q]], "path": path}
            layer_openings.append(o)
        queries.append({"index": idx, "layers": layer_openings})

    proof = {
        "domain_size": m,
        "shift": str(shift),
        "roots": [[str(x) for x in r] for r in roots],
        "final_coeffs": [str(c) for c in final_coeffs],
        "queries": queries,
    }
    return FriProverOutput(proof=proof, layer0_indices=indices)


@dataclass
class FriLayerWitness:
    tree: merkle.MerkleTree
    vals: GF  # (c, A) leaf rows: leaf jj holds [f(x_{jj + k·c}) for k < A]


@dataclass
class FriProverOutput:
    proof: dict
    layer0_indices: List[int]  # query pair-indices into the original domain


def fri_prove(
    evals: GF,
    shift: int,
    transcript: Transcript,
    params: FriParams,
    fused: bool | None = None,
) -> FriProverOutput:
    """Commit + open. evals: (m,) coset evaluations (natural order).

    fused=None selects by backend (round 5): on accelerator backends the
    PADDED layered prover (_fri_prove_padded — the merkle M-machine's
    shared fixed-shape programs + one shared padded fold program, with
    C++/numpy host work for small layers); on CPU the host-orchestrated
    reference path below.  The single-dispatch fused program
    (models/fri_fused.py, fused=True — byte-identical proofs) minimized
    host syncs but its scan-heavy graph cold-compiled in 816–2888 s on
    the remote-compile TPU backend, where compile time — not device time
    — is the scarce resource (docs/BENCH_NOTES.md; measured ~30 ms per
    HLO op, per-shape programs and eager dispatch storms unaffordable)."""
    m = evals.lo.shape[-1]
    assert m & (m - 1) == 0
    if fused:
        from .fri_fused import fri_prove_fused

        return fri_prove_fused(evals, shift, transcript, params)
    import jax as _jax

    if fused is None and _jax.default_backend() != "cpu":
        return _fri_prove_padded(evals, shift, transcript, params)
    fold_fn = fold_layer
    layers: List[FriLayerWitness] = []
    roots = []
    betas = []
    cur = evals
    cur_shift = shift
    schedule = params.layer_schedule(m)
    for A in schedule:
        size = cur.lo.shape[-1]
        c = size // A
        # leaf jj holds [f at jj + k·c for k < A]: reshape (A, c) -> (c, A)
        resh = gl.reshape(cur, (A, c))
        leaves = gl.transpose(resh, (1, 0))
        tree = merkle.commit_leaves(leaves)
        root = tree.root()
        transcript.absorb("fri-root", root)
        beta = transcript.challenge("fri-beta")
        layers.append(FriLayerWitness(tree=tree, vals=leaves))
        roots.append(root)
        betas.append(beta)
        # arity-A fold = log2(A) binary folds with betas β^(2^t)
        b = beta
        for _ in range(A.bit_length() - 1):
            cur = fold_fn(cur, b, cur_shift)
            cur_shift = gl.h_mul(cur_shift, cur_shift)
            b = gl.h_mul(b, b)

    # terminal layer: interpolate and send coefficients (host numpy —
    # the terminal is ≤ terminal_size elements; a device INTT here would
    # cost a per-shape compile on the remote-compile backend for ~64
    # elements of work)
    final_evals = gl.to_int(cur)
    tsize = len(final_evals)
    coeffs_shifted = gl.np_intt(np.asarray(final_evals, dtype=np.uint64))
    s_inv = gl.h_inv(cur_shift)
    final_coeffs, si = [], 1
    for c in coeffs_shifted:
        final_coeffs.append(gl.h_mul(int(c), si))
        si = gl.h_mul(si, s_inv)
    # degree bound: only m/blowup of the terminal coefficients may be nonzero
    keep = tsize // params.blowup
    assert all(c == 0 for c in final_coeffs[keep:]), "terminal degree too high"
    final_coeffs = final_coeffs[:keep]
    transcript.absorb("fri-final", final_coeffs)

    # queries — batched per layer: one u/v gather + one open_many per
    # layer (per-query transfers are latency-bound at 2^22 domains)
    indices = transcript.challenge_indices("fri-query", params.num_queries, m // 2)
    per_layer = []
    js = np.asarray(indices, dtype=np.int64)
    for wit in layers:
        c = wit.vals.lo.shape[0]
        jj = js % c
        rows = np.atleast_2d(gl.to_int(GF(wit.vals.lo[jj], wit.vals.hi[jj])))
        paths = wit.tree.open_many(jj)
        per_layer.append((rows, paths))
        js = jj
    queries = []
    for q, idx in enumerate(indices):
        layer_openings = []
        for (rows, paths) in per_layer:
            path = [[str(x) for x in d] for d in paths[q]]
            if rows.shape[1] == 2:  # arity-2 keeps the (u, v) wire format
                o = {"u": str(int(rows[q][0])), "v": str(int(rows[q][1])),
                     "path": path}
            else:
                o = {"vals": [str(int(x)) for x in rows[q]], "path": path}
            layer_openings.append(o)
        queries.append({"index": idx, "layers": layer_openings})

    proof = {
        "domain_size": m,
        "shift": str(shift),
        "roots": [[str(x) for x in r] for r in roots],
        "final_coeffs": [str(c) for c in final_coeffs],
        "queries": queries,
    }
    return FriProverOutput(proof=proof, layer0_indices=indices)


def fri_verify(
    proof: dict, transcript: Transcript, params: FriParams
) -> tuple[bool, list]:
    """Host-side verification.  Returns (ok, layer0_openings) where
    layer0_openings = [(pair_index, u, v), ...] for the caller to
    cross-check against externally computed evaluations."""
    m = int(proof["domain_size"])
    shift = int(proof["shift"])
    roots = [[int(x) for x in r] for r in proof["roots"]]
    final_coeffs = [int(c) for c in proof["final_coeffs"]]

    # replay transcript (layer arities are deterministic from params)
    schedule = params.layer_schedule(m)
    if len(roots) != len(schedule):
        return False, []
    betas = []
    sizes = []
    shifts = []
    size, cur_shift = m, shift
    for r, A in zip(roots, schedule):
        transcript.absorb("fri-root", r)
        betas.append(transcript.challenge("fri-beta"))
        sizes.append(size)
        shifts.append(cur_shift)
        size //= A
        cur_shift = gl.h_pow(cur_shift, A)
    if size > params.terminal_size:
        return False, []
    if len(final_coeffs) != size // params.blowup:
        return False, []
    transcript.absorb("fri-final", final_coeffs)
    indices = transcript.challenge_indices("fri-query", params.num_queries, m // 2)

    if len(proof["queries"]) != len(indices):
        return False, []
    layer0 = []
    if not roots:
        # zero-layer FRI (m <= terminal_size): the terminal polynomial IS
        # the committed function; queried pair evaluations come from it
        # directly (leaf j of layer 0 holds (f(x_j), f(-x_j)))
        w = gl.primitive_root_of_unity(m)
        half = m // 2

        def ev(x):
            val = 0
            for co in reversed(final_coeffs):
                val = (val * x + co) % gl.P
            return val

        for q, idx in zip(proof["queries"], indices):
            if int(q["index"]) != idx or q["layers"]:
                return False, []
            xu = gl.h_mul(shift, gl.h_pow(w, idx))
            xv = gl.h_mul(shift, gl.h_pow(w, idx + half))
            layer0.append((idx, ev(xu), ev(xv)))
        return True, layer0
    for q, idx in zip(proof["queries"], indices):
        if int(q["index"]) != idx or len(q["layers"]) != len(roots):
            return False, []
        j = idx
        prev_expected = None  # folded value expected at this layer
        for li, layer in enumerate(q["layers"]):
            A = schedule[li]
            c = sizes[li] // A
            jj = j % c
            if A == 2:
                if "u" not in layer:
                    return False, []
                vals = [int(layer["u"]), int(layer["v"])]
            else:
                vals = [int(x) for x in layer.get("vals", [])]
                if len(vals) != A:
                    return False, []
            path = [[int(x) for x in d] for d in layer["path"]]
            if not merkle.verify_path(roots[li], jj, vals, path):
                return False, []
            if li == 0:
                layer0.append((jj, vals[0], vals[1]))
            else:
                # the previous fold must equal this layer's value at j
                if prev_expected != vals[j // c]:
                    return False, []
            # local arity-A fold: log2(A) binary folds, betas β^(2^t);
            # value k sits at position jj + k·c of the size-2^t-halved
            # domain (pairs are (k, k + K/2) at every sub-level)
            b = betas[li]
            sz = sizes[li]
            sh = shifts[li]
            K = A
            cur_vals = vals
            while K > 1:
                w_inv = gl.h_inv(gl.primitive_root_of_unity(sz))
                sh_inv = gl.h_inv(sh)
                nxt = []
                for k in range(K // 2):
                    x_inv = gl.h_mul(sh_inv, gl.h_pow(w_inv, jj + k * c))
                    even = (cur_vals[k] + cur_vals[k + K // 2]) * INV2 % gl.P
                    diff = (cur_vals[k] - cur_vals[k + K // 2]) * INV2 % gl.P
                    odd = diff * x_inv % gl.P * b % gl.P
                    nxt.append((even + odd) % gl.P)
                cur_vals = nxt
                K //= 2
                sz //= 2
                sh = gl.h_mul(sh, sh)
                b = gl.h_mul(b, b)
            prev_expected = cur_vals[0]
            j = jj
        # terminate against the final polynomial
        t_size = sizes[-1] // schedule[-1]
        t_shift = gl.h_pow(shifts[-1], schedule[-1])
        w = gl.primitive_root_of_unity(t_size)
        x = gl.h_mul(t_shift, gl.h_pow(w, j))
        val = 0
        for co in reversed(final_coeffs):
            val = (val * x + co) % gl.P
        if val != prev_expected:
            return False, []
    return True, layer0
