"""FRI low-degree commitment — commit / open / verify.

The polynomial-commitment layer of the chunk prover (BASELINE config 4:
FRI commit/open on a 2^22 constraint polynomial; the reference performs
this inside its external prover service, SURVEY.md §2.9-bis).

Protocol (arity-2 fold, coset domains):
  prover      D_0 = s·H_0 (|H_0| = blowup·deg-bound), f_0 committed via a
              Poseidon Merkle tree whose leaf j holds the sibling pair
              (f(x_j), f(-x_j)) — one opening authenticates both points.
  each layer  β ← transcript;  f_{i+1}(x²) = (f+f⁻)/2 + β·(f-f⁻)/(2x)
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
    arity: int = 2

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

    fused=None auto-selects: on accelerator backends the whole protocol
    runs as ONE jitted dispatch (models/fri_fused.py — byte-identical
    proofs, no per-layer host sync); the host-orchestrated path below is
    the reference implementation and the CPU/test default."""
    m = evals.lo.shape[-1]
    assert m & (m - 1) == 0
    if fused is None:
        import jax as _jax

        fused = _jax.default_backend() != "cpu" and m > params.terminal_size
    if fused:
        from .fri_fused import fri_prove_fused

        return fri_prove_fused(evals, shift, transcript, params)
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
            cur = fold_layer(cur, b, cur_shift)
            cur_shift = gl.h_mul(cur_shift, cur_shift)
            b = gl.h_mul(b, b)

    # terminal layer: interpolate and send coefficients
    final_evals = gl.to_int(cur)
    tsize = len(final_evals)
    coeffs_shifted = gl.to_int(nttm.intt(gl.from_int(final_evals)))
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
