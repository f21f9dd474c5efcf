r"""STARK chunk prover — AIR + ALI + FRI over Goldilocks.

This is the per-chunk proof behind the protocol's GenChunkProof step
(reference semantics: proto/prover/v1/prover.proto:102-111; the reference
ships these opaque proof strings from its external prover).  Round-1 AIR:
a rolling-hash accumulator binding the chunk's data,

    columns  D (data), A (accumulator)
    boundary A(1) = iv                       (first row)
    boundary A(w^{n-1}) = out                (last row)
    step     A(w·x) = γ·A(x) + D(x)          on H \ {last row}

so a verified proof attests that `out` is the γ-rolling hash of the
committed data stream seeded at `iv` — the chunk-integrity statement the
pipeline needs.  The machinery (trace LDE commit → constraint composition
→ FRI → query openings) is the production shape; richer zkEVM AIRs drop
into the same pipeline by adding columns/constraints.

Quotients:
    Q1 = (A(wx) - γA(x) - D(x))·(x - w^{n-1}) / (x^n - 1)
    Q2 = (A(x) - iv) / (x - 1)
    Q3 = (A(x) - out) / (x - w^{n-1})
composition C = α1·Q1 + α2·Q2 + α3·Q3, degree < n, FRI-proven on the
blowup coset.  A(wx) on the LDE domain is a rotation by `blowup`
positions (w = v^blowup), so the whole composition is pointwise device
math — no extra NTTs.

Prover: bulk device work.  Verifier: host bigints only.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops import goldilocks as gl
from ..ops import ntt as nttm
from ..ops.goldilocks import GF
from . import fri, merkle
from .poseidon_tags import chunk_gamma
from .transcript import Transcript


@dataclass
class StarkParams:
    blowup: int = 4
    num_queries: int = 30
    terminal_size: int = 64
    shift: int = gl.MULTIPLICATIVE_GENERATOR
    # FRI reduction arity for layers after the first (fri.FriParams.arity).
    # Recursion (the verifier AIR) consumes arity-2 proofs only, so the
    # node's chunk pipeline keeps 2; big standalone chunk proofs use 8.
    fri_arity: int = 2

    def fri_params(self) -> fri.FriParams:
        return fri.FriParams(
            blowup=self.blowup,
            num_queries=self.num_queries,
            terminal_size=self.terminal_size,
            arity=self.fri_arity,
        )


def build_trace(data: list[int], iv: int, n: int | None = None):
    """Pad data into the first n-1 rows and run the accumulator column.

    out = A(w^{n-1}) is a trace cell (so the last-row boundary quotient is
    a polynomial): the γ-rolling hash of data + zero padding.
    Returns (d_column, a_column, out) as host ints."""
    gamma = chunk_gamma()
    d = [int(x) % gl.P for x in data]
    if n is None:
        n = max(4, 1 << len(d).bit_length()) if d else 4
    assert len(d) <= n - 1, "data must leave the last trace row free"
    d = d + [0] * (n - len(d))
    a = [iv % gl.P]
    for i in range(n - 1):
        a.append((a[-1] * gamma + d[i]) % gl.P)
    return d, a, a[-1]


_LDE_CACHE: dict = {}  # (n, blowup, shift) -> jitted (d, a) -> (D_lde, A_lde, rows)
_COMP_CACHE: dict = {}  # (n, blowup, shift) -> jitted composition program


def _lde_prog(n: int, blowup: int, shift: int):
    """Cached jitted trace-LDE program: INTT + blowup-LDE of both columns
    + the (m, 2) leaf rows, as ONE compile per trace shape (the eager
    per-op version paid a remote compile per primitive per shape on the
    axon backend)."""
    key = (n, blowup, shift)
    if key not in _LDE_CACHE:
        import jax

        m = n * blowup

        def run(dlo, dhi, alo, ahi):
            D = nttm.intt_auto(GF(dlo, dhi))
            A = nttm.intt_auto(GF(alo, ahi))
            D_lde = nttm.lde(D, blowup, shift)
            A_lde = nttm.lde(A, blowup, shift)
            rows = GF(
                jnp.stack([A_lde.lo, D_lde.lo], axis=1),
                jnp.stack([A_lde.hi, D_lde.hi], axis=1),
            )  # (m, 2): leaf = [A(x), D(x)]
            # padded A||D buffer for the shared M-machine trace commit
            # (leaf j gathers [buf[j], buf[j+m]]) — built in-program so
            # no eager concat/pad op is ever dispatched
            M = 2 * merkle.PAD_ROWS
            if 2 * m <= M:
                z = jnp.zeros((M - 2 * m,), jnp.uint32)
                buf = (
                    jnp.concatenate([A_lde.lo, D_lde.lo, z]),
                    jnp.concatenate([A_lde.hi, D_lde.hi, z]),
                )
            else:
                buf = (jnp.zeros((0,), jnp.uint32),) * 2
            return D_lde, A_lde, rows, buf

        _LDE_CACHE[key] = jax.jit(run)
    return _LDE_CACHE[key]


_COMP_CONSTS: dict = {}  # (n, blowup, shift) -> device-resident static vectors


def _comp_consts(n: int, blowup: int, shift: int):
    """Host-precomputed static composition vectors, resident on device:
    x_j = shift·w^j, (x−w_last)·Z_H(x)^-1, (x−1)^-1, (x−w_last)^-1.
    All depend only on the (n, blowup, shift) shape — computing them on
    the host (vectorized np_mulmod pow ladder, ~1 s once) keeps the
    jitted composition program at ~700 HLO ops; the round-4 in-program
    version (device power ladder + pow_const + batch_inv scans) was ~9K
    ops ≈ minutes of cold compile on the axon backend (~30 ms/HLO-op,
    measured)."""
    key = (n, blowup, shift)
    if key not in _COMP_CONSTS:
        import jax.numpy as _jnp

        m = n * blowup
        w_last = gl.h_pow(gl.primitive_root_of_unity(n), n - 1)
        x = gl.np_mulmod(
            gl.powers_np(gl.primitive_root_of_unity(m), m), np.uint64(shift)
        )

        def np_inv(a: np.ndarray) -> np.ndarray:
            # a^(p-2) via vectorized square-and-multiply (64-bit exponent)
            e = gl.P - 2
            result = np.ones_like(a)
            base = a.copy()
            while e:
                if e & 1:
                    result = gl.np_mulmod(result, base)
                e >>= 1
                if e:
                    base = gl.np_mulmod(base, base)
            return result

        # Z_H on the coset is period-blowup: s^n·v^{jn} − 1
        zh_period = gl.np_submod(
            gl.np_mulmod(
                np.uint64(gl.h_pow(shift, n)),
                gl.powers_np(gl.h_pow(gl.primitive_root_of_unity(m), n), blowup),
            ),
            np.uint64(1),
        )
        zh = np.tile(zh_period, m // blowup)
        x1 = gl.np_submod(x, np.uint64(1))
        xw = gl.np_submod(x, np.uint64(w_last))
        zh_inv = np_inv(zh)
        x1_inv = np_inv(x1)
        xw_inv = np_inv(xw)
        # fold (x − w_last) into the Z_H inverse: q1 needs (x−w_last)/Z_H
        q1_mult = gl.np_mulmod(xw, zh_inv)

        _COMP_CONSTS[key] = (q1_mult, x1_inv, xw_inv)
    return _COMP_CONSTS[key]


_COMP_CONSTS_DEV: dict = {}


def _comp_consts_dev(n: int, blowup: int, shift: int):
    key = (n, blowup, shift)
    if key not in _COMP_CONSTS_DEV:
        import jax.numpy as _jnp

        def dev(a: np.ndarray) -> GF:
            g = gl.from_int_np(a)
            return GF(_jnp.asarray(g.lo), _jnp.asarray(g.hi))

        _COMP_CONSTS_DEV[key] = tuple(
            dev(a) for a in _comp_consts(n, blowup, shift)
        )
    return _COMP_CONSTS_DEV[key]


def _comp_prog(n: int, blowup: int, shift: int):
    """Cached jitted composition program (~700 HLO ops).  Transcript
    -derived values (alphas) and per-chunk publics (iv, out) are traced
    scalar planes so they never bake into the compile key; the static
    vectors arrive as device-resident inputs (_comp_consts)."""
    key = (n, blowup, shift)
    if key not in _COMP_CACHE:
        import jax

        m = n * blowup
        gamma = chunk_gamma()

        def run(A_lde, D_lde, al, iv_s, out_s, q1_mult, x1_inv, xw_inv):
            def bc(s: GF) -> GF:
                return GF(
                    jnp.broadcast_to(s.lo, (m,)), jnp.broadcast_to(s.hi, (m,))
                )

            a_shift = GF(
                jnp.roll(A_lde.lo, -blowup), jnp.roll(A_lde.hi, -blowup)
            )
            c1 = gl.sub(gl.sub(a_shift, gl.mul_scalar(A_lde, gamma)), D_lde)
            q1 = gl.mul(c1, q1_mult)
            q2 = gl.mul(gl.sub(A_lde, bc(GF(iv_s.lo, iv_s.hi))), x1_inv)
            q3 = gl.mul(gl.sub(A_lde, bc(GF(out_s.lo, out_s.hi))), xw_inv)
            a0 = GF(al.lo[0], al.hi[0])
            a1 = GF(al.lo[1], al.hi[1])
            a2 = GF(al.lo[2], al.hi[2])
            return gl.add(
                gl.add(gl.mul(q1, bc(a0)), gl.mul(q2, bc(a1))),
                gl.mul(q3, bc(a2)),
            )

        _COMP_CACHE[key] = jax.jit(run)
    return _COMP_CACHE[key]


def _np_trace_lde(d_col, a_col, n, blowup, shift):
    """Numpy trace LDE: INTT + coset-shift + NTT per column."""
    m = n * blowup
    out = []
    for col in (a_col, d_col):
        coeffs = gl.np_intt(np.asarray(col, dtype=np.uint64))
        padded = np.zeros(m, dtype=np.uint64)
        padded[:n] = gl.np_mulmod(coeffs, gl.powers_np(shift, n))
        out.append(gl.np_ntt(padded))
    return out[0], out[1]  # A_lde, D_lde


def _np_composition(A_np, D_np, alphas, iv, out, n, blowup, shift):
    """Numpy composition — same formula as the device program."""
    m = n * blowup
    gamma = chunk_gamma()
    q1_mult, x1_inv, xw_inv = _comp_consts(n, blowup, shift)
    a_shift = np.roll(A_np, -blowup)
    c1 = gl.np_submod(
        gl.np_submod(a_shift, gl.np_mulmod(A_np, np.uint64(gamma))), D_np
    )
    q1 = gl.np_mulmod(c1, q1_mult)
    q2 = gl.np_mulmod(gl.np_submod(A_np, np.uint64(iv % gl.P)), x1_inv)
    q3 = gl.np_mulmod(gl.np_submod(A_np, np.uint64(out % gl.P)), xw_inv)
    comp = gl.np_addmod(
        gl.np_addmod(
            gl.np_mulmod(q1, np.uint64(alphas[0])),
            gl.np_mulmod(q2, np.uint64(alphas[1])),
        ),
        gl.np_mulmod(q3, np.uint64(alphas[2])),
    )
    return comp


def prove_chunk(
    data: list[int],
    iv: int,
    params: StarkParams | None = None,
    n_rows: int | None = None,
) -> dict:
    """Produce a chunk STARK proof for the rolling hash of `data`.

    n_rows fixes the trace size (recursion needs a uniform circuit shape
    across chunks — models/recursion.py)."""
    import jax as _jax

    params = params or StarkParams()
    d_col, a_col, out = build_trace(data, iv, n=n_rows)
    n = len(d_col)
    m = n * params.blowup
    gamma = chunk_gamma()
    on_cpu = _jax.default_backend() == "cpu"
    # Small chunks (the node/e2e profile, 4096-row traces) run the WHOLE
    # pipeline in numpy + the C++ hasher — zero device compiles; on the
    # remote-compile backend every program/shape costs ~minutes cold
    # (measured round 5) while the numpy path is milliseconds at 2^14.
    import os as _osm

    np_mode = (n <= (1 << 14) and not on_cpu) or bool(
        _osm.environ.get("EZT_FORCE_NP_STARK")
    )

    transcript = Transcript("ezt-chunk-stark")
    if np_mode:
        A_np, D_np = _np_trace_lde(d_col, a_col, n, params.blowup, params.shift)
        rows_np = np.stack([A_np, D_np], axis=1)  # (m, 2)
        tree = fri._NpTree(rows_np)
        transcript.absorb("public", [n, iv, out, gamma])
        transcript.absorb("trace-root", tree.root())
        alphas = transcript.challenges("alpha", 3)
        comp_np = _np_composition(
            A_np, D_np, alphas, iv, out, n, params.blowup, params.shift
        )
        # host-plane GF: the padded FRI prover routes small domains to
        # its numpy/C++ path without touching the device
        comp = gl.from_int_np(comp_np)
    else:
        dg = gl.from_int(np.array(d_col, dtype=np.uint64))
        ag = gl.from_int(np.array(a_col, dtype=np.uint64))
        D_lde, A_lde, rows, trace_buf = _lde_prog(
            n, params.blowup, params.shift
        )(dg.lo, dg.hi, ag.lo, ag.hi)
        if on_cpu or m < merkle.NATIVE_MIN_LEAVES or 2 * m > 2 * merkle.PAD_ROWS:
            tree = merkle.commit_leaves(rows)
        else:
            # M-machine trace commit: leaf j = [buf[j], buf[j+m]] of the
            # padded A||D buffer — the shared arrange/tree/open programs
            tree = merkle.commit_evals_device(trace_buf, m, 2)
        transcript.absorb("public", [n, iv, out, gamma])
        transcript.absorb("trace-root", tree.root())
        alphas = transcript.challenges("alpha", 3)
        al = gl.from_int(np.array(alphas, dtype=np.uint64))
        iv_s = gl.from_int(np.uint64(iv % gl.P))
        out_s = gl.from_int(np.uint64(out % gl.P))
        q1_mult, x1_inv, xw_inv = _comp_consts_dev(n, params.blowup, params.shift)
        comp = _comp_prog(n, params.blowup, params.shift)(
            A_lde, D_lde, al, iv_s, out_s, q1_mult, x1_inv, xw_inv
        )

    # --- FRI on the composition --------------------------------------------
    fri_out = fri.fri_prove(comp, params.shift, transcript, params.fri_params())

    # --- trace openings at the queried points (batched gathers) -------------
    all_idx = []
    for jj in fri_out.layer0_indices:
        all_idx += [jj, (jj + params.blowup) % m, jj + m // 2, (jj + m // 2 + params.blowup) % m]
    idx_arr = np.asarray(all_idx, dtype=np.int64)
    if isinstance(tree, (merkle.PaddedMerkleTree,)) or hasattr(tree, "open_with_rows"):
        row_vals, all_paths = tree.open_with_rows(all_idx)
        row_vals = np.atleast_2d(row_vals)
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
                    "index": all_idx[i],
                    "row": [str(int(x)) for x in row_vals[i]],
                    "path": [[str(x) for x in p] for p in all_paths[i]],
                }
            )
        openings.append(rows_open)

    return {
        "version": 1,
        "n": n,
        "blowup": params.blowup,
        "shift": str(params.shift),
        "public": {"iv": str(iv), "out": str(out), "gamma": str(gamma)},
        "trace_root": [str(x) for x in tree.root()],
        "fri": fri_out.proof,
        "trace_openings": openings,
    }


def verify_chunk(proof: dict, params: StarkParams | None = None) -> bool:
    """Host-side verification of a chunk proof."""
    params = params or StarkParams()
    try:
        n = int(proof["n"])
        blowup = int(proof["blowup"])
        shift = int(proof["shift"])
        iv = int(proof["public"]["iv"])
        out = int(proof["public"]["out"])
        gamma = int(proof["public"]["gamma"])
        root = [int(x) for x in proof["trace_root"]]
    except (KeyError, ValueError):
        return False
    if blowup != params.blowup or shift != params.shift or gamma != chunk_gamma():
        return False
    m = n * blowup

    transcript = Transcript("ezt-chunk-stark")
    transcript.absorb("public", [n, iv, out, gamma])
    transcript.absorb("trace-root", root)
    alphas = transcript.challenges("alpha", 3)

    ok, layer0 = fri.fri_verify(proof["fri"], transcript, params.fri_params())
    if not ok:
        return False
    if int(proof["fri"]["domain_size"]) != m:
        return False

    w = gl.primitive_root_of_unity(m)
    w_last = gl.h_pow(gl.primitive_root_of_unity(n), n - 1)

    def composition_at(j: int, a_x: int, a_wx: int, d_x: int) -> int:
        x = gl.h_mul(shift, gl.h_pow(w, j))
        zh = (gl.h_pow(x, n) - 1) % gl.P
        c1 = (a_wx - gamma * a_x - d_x) % gl.P
        q1 = c1 * (x - w_last) % gl.P * gl.h_inv(zh) % gl.P
        q2 = (a_x - iv) % gl.P * gl.h_inv((x - 1) % gl.P) % gl.P
        q3 = (a_x - out) % gl.P * gl.h_inv((x - w_last) % gl.P) % gl.P
        return (alphas[0] * q1 + alphas[1] * q2 + alphas[2] * q3) % gl.P

    if len(proof["trace_openings"]) != len(layer0):
        return False
    for rows_open, (jj, u_val, v_val) in zip(proof["trace_openings"], layer0):
        if len(rows_open) != 4:
            return False
        expect_idx = [jj, (jj + blowup) % m, jj + m // 2, (jj + m // 2 + blowup) % m]
        vals = {}
        for entry, want_i in zip(rows_open, expect_idx):
            i = int(entry["index"])
            if i != want_i:
                return False
            row = [int(x) for x in entry["row"]]
            if len(row) != 2:
                return False
            path = [[int(x) for x in p] for p in entry["path"]]
            if not merkle.verify_path(root, i, row, path):
                return False
            vals[i] = row  # [A(x_i), D(x_i)]
        # recompute the composition at x_jj and x_{jj+m/2}
        c_u = composition_at(
            jj, vals[jj][0], vals[(jj + blowup) % m][0], vals[jj][1]
        )
        c_v = composition_at(
            jj + m // 2,
            vals[jj + m // 2][0],
            vals[(jj + m // 2 + blowup) % m][0],
            vals[jj + m // 2][1],
        )
        if c_u != u_val or c_v != v_val:
            return False
    return True
