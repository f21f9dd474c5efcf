"""Wrap-profile AIR STARK — the attestation re-proven with SNARK-friendly
commitments so the Groth16 final wrap can verify it IN-CIRCUIT.

This is the same AIR/LDE/composition/FRI mathematics as models/air.py +
models/fri.py (Goldilocks arithmetic, identical constraint families) with
three protocol substitutions, each chosen to make one verifier step cheap
inside a BN254 R1CS (VERDICT r2 item 5; the reference's on-chain verifier
consumes only the wrapped FinalProof — src/settlement/ethereum/mod.rs:
338-394, proto/prover/v1/prover.proto:130-148):

  1. COMMITMENTS: Poseidon2-Fr Merkle trees (models/merkle_fr.py), leaves
     packed 3 GL values per Fr element.  One in-circuit path level = one
     permutation (~492 constraints) instead of a Goldilocks-Poseidon
     permutation (~62K constraints after mod-p reduction witnesses).
  2. TRANSCRIPT: a Poseidon2-Fr duplex sponge (models/transcript_fr.py);
     constraint alphas are POWERS of one challenge (alpha^(i+1)) instead
     of ~300 independent squeezes — one 254-bit decomposition instead of
     hundreds (standard Schwartz-Zippel batching, same soundness bound up
     to a factor n_alphas).
  3. PERIODIC COLUMNS: committed once per circuit shape as a CONSTANTS
     TREE over the LDE coset rows and Merkle-opened at the query points.
     The host verifier (models/air.py) evaluates periodic interpolants
     with a degree-L Horner — L reaches 8192 on production attestation
     shapes, far beyond any circuit budget; an opening is ~30
     permutations.  The constants root is recomputable by anyone from the
     public AIR definition (and is a baked constant of the wrap circuit).

Host verification (verify_wrap) is the reference implementation the R1CS
circuit (models/wrap_circuit.py) mirrors gadget for gadget.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import goldilocks as gl
from ..ops import ntt as nttm
from ..ops import poseidon_fr as pfr
from ..ops.goldilocks import GF
from . import fri as fri_m
from . import merkle_fr
from .air import (Air, Boundary, HostAlg, _composition_jit, _composition_np,
                  _lde_jit, _np_lde_cols, _columns)
from .transcript_fr import TranscriptFr

INV2 = fri_m.INV2


# ---------------------------------------------------------------------------
# constants tree (periodic columns committed per (air, shift))


def constants_rows(air: Air, shift: int) -> np.ndarray:
    """(m, K) canonical periodic values at every LDE position — row j is
    every periodic column evaluated at x_j = shift·w_m^j.  The LDE of a
    tiled period-L pattern IS that evaluation, so rows come straight from
    the prover's periodic cache."""
    per = air.periodic_lde(shift)
    cols = np.stack([np.asarray(gl.to_int(p), dtype=np.uint64) for p in per])
    return cols.T  # (m, K)


def constants_tree(air: Air, shift: int) -> merkle_fr.MerkleTreeFr:
    key = ("const_tree_fr", shift)
    cache = air.__dict__.setdefault("_wrap_cache", {})
    if key not in cache:
        rows = constants_rows(air, shift)
        packed = [pfr.pack_gl_host([int(v) for v in r]) for r in rows]
        cache[key] = merkle_fr.commit_packed_host(packed)
    return cache[key]


def constants_root(air: Air, shift: int) -> int:
    return constants_tree(air, shift).root()


# ---------------------------------------------------------------------------
# FRI with Fr trees (host-orchestrated; folds stay device ops)


def _fri_prove_fr(
    evals: GF, shift: int, transcript: TranscriptFr, params: fri_m.FriParams
):
    m = evals.lo.shape[-1]
    assert m & (m - 1) == 0
    layers = []  # (tree, u_vals np, v_vals np)
    roots: List[int] = []
    betas: List[int] = []
    cur = evals
    cur_shift = shift
    while cur.lo.shape[-1] > params.terminal_size:
        size = cur.lo.shape[-1]
        half = size // 2
        u = GF(cur.lo[:half], cur.hi[:half])
        v = GF(cur.lo[half:], cur.hi[half:])
        # leaf j = packed (u_j, v_j): one Fr element per leaf
        pairs = GF(
            jnp.stack([u.lo, v.lo], axis=1), jnp.stack([u.hi, v.hi], axis=1)
        )  # (half, 2)
        tree = merkle_fr.commit_rows_gl(pairs)
        root = tree.root()
        transcript.absorb("fri-root", [root])
        beta = transcript.challenge_gl("fri-beta")
        layers.append(
            (
                tree,
                np.asarray(gl.to_int(u), dtype=np.uint64),
                np.asarray(gl.to_int(v), dtype=np.uint64),
            )
        )
        roots.append(root)
        betas.append(beta)
        cur = fri_m.fold_layer(cur, beta, cur_shift)
        cur_shift = gl.h_mul(cur_shift, cur_shift)

    final_evals = gl.to_int(cur)
    tsize = len(final_evals)
    coeffs_shifted = gl.to_int(nttm.intt(gl.from_int(final_evals)))
    s_inv = gl.h_inv(cur_shift)
    final_coeffs, si = [], 1
    for c in coeffs_shifted:
        final_coeffs.append(gl.h_mul(int(c), si))
        si = gl.h_mul(si, s_inv)
    keep = tsize // params.blowup
    assert all(c == 0 for c in final_coeffs[keep:]), "terminal degree too high"
    final_coeffs = final_coeffs[:keep]
    transcript.absorb_packed_gl("fri-final", final_coeffs)

    grind_nonce = None
    if params.grind_bits:
        grind_nonce = transcript.grind(params.grind_bits)

    indices = transcript.challenge_indices(
        "fri-query", params.num_queries, m // 2
    )
    queries = []
    js = list(indices)
    per_layer = []
    for tree, u_vals, v_vals in layers:
        half = len(u_vals)
        jj = [j % half for j in js]
        paths = tree.open_many(jj)
        per_layer.append(
            (
                [int(u_vals[j]) for j in jj],
                [int(v_vals[j]) for j in jj],
                paths,
            )
        )
        js = jj
    for q, idx in enumerate(indices):
        layer_openings = [
            {
                "u": str(us[q]),
                "v": str(vs[q]),
                "path": [str(x) for x in paths[q]],
            }
            for (us, vs, paths) in per_layer
        ]
        queries.append({"index": idx, "layers": layer_openings})

    proof = {
        "domain_size": m,
        "shift": str(shift),
        "roots": [str(r) for r in roots],
        "final_coeffs": [str(c) for c in final_coeffs],
        "queries": queries,
    }
    if grind_nonce is not None:
        proof["grind_nonce"] = str(grind_nonce)
    return proof, indices


def _fri_verify_fr(
    proof: dict, transcript: TranscriptFr, params: fri_m.FriParams
):
    """Host mirror of fri.fri_verify over Fr trees.  Returns
    (ok, [(pair_index, u, v)] at layer 0)."""
    m = int(proof["domain_size"])
    shift = int(proof["shift"])
    roots = [int(r) for r in proof["roots"]]
    final_coeffs = [int(c) for c in proof["final_coeffs"]]

    betas, sizes, shifts = [], [], []
    size, cur_shift = m, shift
    for r in roots:
        if size <= params.terminal_size:
            return False, []
        transcript.absorb("fri-root", [r])
        betas.append(transcript.challenge_gl("fri-beta"))
        sizes.append(size)
        shifts.append(cur_shift)
        size //= 2
        cur_shift = gl.h_mul(cur_shift, cur_shift)
    if size > params.terminal_size:
        return False, []
    if len(final_coeffs) != size // params.blowup:
        return False, []
    transcript.absorb_packed_gl("fri-final", final_coeffs)
    if params.grind_bits:
        nonce = int(proof.get("grind_nonce", -1))
        if nonce < 0 or not transcript.grind_check(nonce, params.grind_bits):
            return False, []
    indices = transcript.challenge_indices(
        "fri-query", params.num_queries, m // 2
    )
    if len(proof["queries"]) != len(indices):
        return False, []
    layer0 = []
    if not roots:
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
        prev_expected = None
        for li, layer in enumerate(q["layers"]):
            half = sizes[li] // 2
            jj = j % half
            u, v = int(layer["u"]), int(layer["v"])
            path = [int(x) for x in layer["path"]]
            if not merkle_fr.verify_path_gl(roots[li], jj, [u, v], path):
                return False, []
            if li == 0:
                layer0.append((jj, u, v))
            else:
                got = u if j < half else v
                if prev_expected != got:
                    return False, []
            beta = betas[li]
            w_inv = gl.h_inv(gl.primitive_root_of_unity(sizes[li]))
            x_inv = gl.h_mul(gl.h_inv(shifts[li]), gl.h_pow(w_inv, jj))
            even = (u + v) * INV2 % gl.P
            odd = (u - v) * INV2 % gl.P * x_inv % gl.P * beta % gl.P
            prev_expected = (even + odd) % gl.P
            j = jj
        t_size = sizes[-1] // 2
        t_shift = gl.h_mul(shifts[-1], shifts[-1])
        w = gl.primitive_root_of_unity(t_size)
        x = gl.h_mul(t_shift, gl.h_pow(w, j))
        val = 0
        for c in reversed(final_coeffs):
            val = (val * x + c) % gl.P
        if val != prev_expected:
            return False, []
    return True, layer0


# ---------------------------------------------------------------------------
# prover


def n_alphas_of(air: Air, boundaries: List[Boundary]) -> int:
    return sum(c.arity for c in air.constraints) + len(boundaries)


def alpha_powers(alpha: int, n: int) -> List[int]:
    out, a = [], 1
    for _ in range(n):
        a = gl.h_mul(a, alpha)
        out.append(a)
    return out


def prove_wrap(
    air: Air,
    trace_rows: GF,
    publics: List[int],
    boundaries: List[Boundary],
    num_queries: int = 4,
    shift: int = gl.MULTIPLICATIVE_GENERATOR,
    grind_bits: int = 0,
) -> dict:
    """Wrap-profile STARK proof (Fr commitments + Fr transcript).

    grind_bits adds EthSTARK-style proof-of-work before the query draw
    (~2^g host permutations for the prover, one conjectured soundness
    bit each for the verifier)."""
    n, C = trace_rows.lo.shape
    assert n == air.n and C == air.n_cols
    B = air.ext_blowup
    m = n * B

    import os as _os

    import jax as _jax

    np_mode = not _os.environ.get("EZT_FORCE_DEV_AIR") and (
        _jax.default_backend() == "cpu" or m <= (1 << 17)
    )
    if np_mode:
        # full numpy pipeline (round 5): zero XLA compiles — see air.prove
        cols_np = np.atleast_2d(gl.to_int(_columns(trace_rows)))
        lde_np = _np_lde_cols(cols_np, B, shift)  # (C, m)
        rows_np = lde_np.T
        rows = gl.from_int_np(rows_np)
    else:
        lde_fn = _lde_jit(air, shift)
        lde_cols = lde_fn(_columns(trace_rows))  # (C, m)
        rows = GF(lde_cols.lo.T, lde_cols.hi.T)  # (m, C)
    tree = merkle_fr.commit_rows_gl(rows)
    c_root = constants_root(air, shift)

    t = TranscriptFr(f"ezt-air-wrap/{air.name}")
    t.absorb("public", [len(publics)] + [int(v) % gl.P for v in publics])
    t.absorb(
        "boundary", [v for b in boundaries for v in (b.col, b.row, b.value % gl.P)]
    )
    t.absorb("const-root", [c_root])
    t.absorb("trace-root", [tree.root()])
    alpha = t.challenge_gl("alpha")
    alphas = alpha_powers(alpha, n_alphas_of(air, boundaries))

    b_struct = tuple((b.col, b.row) for b in boundaries)
    if np_mode:
        comp = gl.from_int_np(
            _composition_np(air, shift, b_struct)(
                lde_np, alphas, [b.value % gl.P for b in boundaries]
            )
        )
    else:
        comp_fn = _composition_jit(air, shift, b_struct)
        alphas_gf = gl.from_int(np.array(alphas, dtype=np.uint64))
        bvals_gf = gl.from_int(
            np.array([b.value % gl.P for b in boundaries], dtype=np.uint64)
        )
        comp = comp_fn(lde_cols, alphas_gf, bvals_gf)

    fri_proof, indices = _fri_prove_fr(
        comp, shift, t, air.fri_params(num_queries, grind_bits)
    )

    all_idx = []
    for jj in indices:
        all_idx += [jj, (jj + B) % m, jj + m // 2, (jj + m // 2 + B) % m]
    idx_arr = np.asarray(all_idx, dtype=np.int64)
    if np_mode:
        row_vals = np.atleast_2d(rows_np[idx_arr])
    else:
        row_vals = np.atleast_2d(gl.to_int(GF(rows.lo[idx_arr], rows.hi[idx_arr])))
    all_paths = tree.open_many(all_idx)
    openings = []
    for q in range(len(indices)):
        rows_open = []
        for k in range(4):
            i = q * 4 + k
            rows_open.append(
                {
                    "index": int(all_idx[i]),
                    "row": [str(int(x)) for x in row_vals[i]],
                    "path": [str(x) for x in all_paths[i]],
                }
            )
        openings.append(rows_open)

    # constants openings at jj and jj + m/2 (periodic values at x and -x)
    c_tree = constants_tree(air, shift)
    c_rows = constants_rows(air, shift)
    const_openings = []
    for jj in indices:
        ent = []
        for i in (jj, jj + m // 2):
            ent.append(
                {
                    "index": int(i),
                    "row": [str(int(v)) for v in c_rows[i]],
                    "path": [str(x) for x in c_tree.open_many([i])[0]],
                }
            )
        const_openings.append(ent)

    return {
        "version": 1,
        "kind": "air-wrap",
        "air": air.name,
        "n": n,
        "n_cols": C,
        "ext_blowup": B,
        "shift": str(shift),
        "num_queries": num_queries,
        "grind_bits": grind_bits,
        "publics": [str(int(v) % gl.P) for v in publics],
        "boundaries": [[b.col, b.row, str(b.value % gl.P)] for b in boundaries],
        "const_root": str(c_root),
        "trace_root": str(tree.root()),
        "fri": fri_proof,
        "trace_openings": openings,
        "const_openings": const_openings,
    }


# ---------------------------------------------------------------------------
# verifier (host reference; the R1CS circuit mirrors this function)


def verify_wrap(
    air: Air,
    proof: dict,
    publics: List[int],
    boundaries: List[Boundary],
    expected_queries: "int | None" = None,
    expected_grind_bits: "int | None" = None,
) -> bool:
    """expected_queries/expected_grind_bits pin the wrap STARK's OWN
    soundness parameters (the protocol's, not the proof's claim —
    otherwise a forger could present a 1-query wrap)."""
    try:
        n = int(proof["n"])
        C = int(proof["n_cols"])
        B = int(proof["ext_blowup"])
        shift = int(proof["shift"])
        num_queries = int(proof["num_queries"])
        grind_bits = int(proof.get("grind_bits", 0))
        root = int(proof["trace_root"])
        c_root = int(proof["const_root"])
        p_pub = [int(v) for v in proof["publics"]]
        p_bnd = [(int(c), int(r), int(v)) for c, r, v in proof["boundaries"]]
    except (KeyError, ValueError, TypeError):
        return False
    if n != air.n or C != air.n_cols or B != air.ext_blowup:
        return False
    if expected_queries is not None and num_queries != expected_queries:
        return False
    if expected_grind_bits is not None and grind_bits != expected_grind_bits:
        return False
    if p_pub != [int(v) % gl.P for v in publics]:
        return False
    if p_bnd != [(b.col, b.row, b.value % gl.P) for b in boundaries]:
        return False
    if c_root != constants_root(air, shift):
        return False
    m = n * B

    t = TranscriptFr(f"ezt-air-wrap/{air.name}")
    t.absorb("public", [len(publics)] + [int(v) % gl.P for v in publics])
    t.absorb(
        "boundary", [v for b in boundaries for v in (b.col, b.row, b.value % gl.P)]
    )
    t.absorb("const-root", [c_root])
    t.absorb("trace-root", [root])
    alpha = t.challenge_gl("alpha")
    n_con_alphas = sum(c.arity for c in air.constraints)
    alphas = alpha_powers(alpha, n_con_alphas + len(boundaries))

    ok, layer0 = _fri_verify_fr(
        proof["fri"], t, air.fri_params(num_queries, grind_bits)
    )
    if not ok or int(proof["fri"]["domain_size"]) != m:
        return False
    if len(proof["trace_openings"]) != len(layer0):
        return False
    if len(proof["const_openings"]) != len(layer0):
        return False

    w_m = gl.primitive_root_of_unity(m)
    w_n = gl.primitive_root_of_unity(n)
    w_last = gl.h_pow(w_n, n - 1)
    alg = HostAlg()

    def composition_at(x, cur_vals, nxt_vals, per_vals) -> int:
        zh = (gl.h_pow(x, n) - 1) % gl.P
        zh_inv = gl.h_inv(zh)
        comp = 0
        last_fac = (x - w_last) % gl.P
        off = 0
        for c in air.constraints:
            v = c.fn(alg, cur_vals, nxt_vals, per_vals)
            vals = [int(x_) for x_ in np.atleast_1d(np.asarray(v, dtype=np.uint64))]
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

    K = len(air.periodic)
    for qi, (rows_open, const_open, (jj, u_val, v_val)) in enumerate(
        zip(proof["trace_openings"], proof["const_openings"], layer0)
    ):
        if len(rows_open) != 4 or len(const_open) != 2:
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
            path = [int(x) for x in entry["path"]]
            if not merkle_fr.verify_path_gl(root, i, row, path):
                return False
            vals[i] = row
        per_uv = []
        for entry, want_i in zip(const_open, (jj, jj + m // 2)):
            i = int(entry["index"])
            if i != want_i:
                return False
            row = [int(x) for x in entry["row"]]
            if len(row) != K:
                return False
            path = [int(x) for x in entry["path"]]
            if not merkle_fr.verify_path_gl(c_root, i, row, path):
                return False
            per_uv.append(row)
        x_u = gl.h_mul(shift, gl.h_pow(w_m, jj))
        x_v = (gl.P - x_u) % gl.P
        c_u = composition_at(x_u, vals[jj], vals[(jj + B) % m], per_uv[0])
        c_v = composition_at(
            x_v, vals[jj + m // 2], vals[(jj + m // 2 + B) % m], per_uv[1]
        )
        if c_u != u_val or c_v != v_val:
            return False
    return True
