"""Poseidon Merkle tree — the prover's vector-commitment.

Tree construction is bulk device work (every level is one vectorized
2-to-1 Poseidon compression over the whole level); openings pull only the
queried O(log N) digests to the host.  Verification is host-side bigint
math so an untrusting party can check proofs without a TPU.

Role in the stack: commits to LDE'd trace/constraint polynomials for the
FRI layer (BASELINE config 2: Merkle commit over 2^16 leaves; the
reference's equivalent lives in its external prover service —
SURVEY.md §2.9-bis).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..ops import goldilocks as gl
from ..ops import poseidon
from ..ops.goldilocks import GF


@dataclass
class MerkleTree:
    """levels[0] = leaf digests (N, 4) ... levels[-1] = root (1, 4)."""

    levels: List[GF]

    @property
    def num_leaves(self) -> int:
        return self.levels[0].lo.shape[0]

    def root(self) -> list[int]:
        return [int(v) for v in gl.to_int(self.levels[-1])[0]]

    def open(self, index: int) -> list[list[int]]:
        """Sibling digests bottom-up for one leaf index (host ints)."""
        return self.open_many([index])[0]

    def open_many(self, indices) -> list[list[list[int]]]:
        """Batched openings: ONE device gather + transfer per tree level
        (instead of per query per level — at 2^22 domains the per-element
        transfer latency over the device tunnel dominates otherwise).
        Returns [paths[q][level][4] for q in indices]."""
        idx = np.asarray(list(indices), dtype=np.int64)
        per_level = []
        cur = idx
        for level in self.levels[:-1]:
            sib = cur ^ 1
            digs = gl.to_int(GF(level.lo[sib], level.hi[sib]))  # (Q, 4)
            per_level.append(np.atleast_2d(digs))
            cur = cur >> 1
        return [
            [[int(v) for v in lv[q]] for lv in per_level]
            for q in range(len(idx))
        ]


def commit_digests(leaf_digests: GF) -> MerkleTree:
    """Build a tree over precomputed (N, 4) leaf digests; N a power of 2."""
    n = leaf_digests.lo.shape[0]
    assert n & (n - 1) == 0 and n >= 1
    levels = [leaf_digests]
    cur = leaf_digests
    while cur.lo.shape[0] > 1:
        even = GF(cur.lo[0::2], cur.hi[0::2])
        odd = GF(cur.lo[1::2], cur.hi[1::2])
        cur = poseidon.hash_two(even, odd)
        levels.append(cur)
    return MerkleTree(levels=levels)


def _commit_leaves_host(leaves: GF) -> MerkleTree:
    """Host-numpy commit: on CPU backends the per-op dispatch overhead of
    the eager device path dwarfs the math; vectorized numpy Poseidon
    (poseidon.np_perm, bit-identical to perm_host) hashes whole levels at
    once — the round-4 row-by-row bigint loop here dominated the CPU
    test suite's runtime.  Production TPU runs use the device path."""
    rows = gl.to_int(leaves)
    if rows.ndim == 1:
        rows = rows[:, None]
    level = poseidon.np_hash_elements(rows)  # (n, 4)
    levels_np = [level]
    while level.shape[0] > 1:
        level = poseidon.np_hash_two(level[0::2], level[1::2])
        levels_np.append(level)
    levels = [gl.from_int_np(lv) for lv in levels_np]
    return MerkleTree(levels=levels)


import jax as _jax
import jax.numpy as _jnp


# --- the "M-machine": fixed-shape shared device programs ------------------
#
# Round-5 axon measurements: remote-compile cost is ~linear in HLO op
# count (~30 ms/op — a scan-free 10-perm program compiled in 840 s) and
# EVERY eager primitive dispatch at a new shape pays its own remote
# compile (~tens of seconds).  Per-tree-shape programs and eager
# reshape/gather/slice storms are therefore unaffordable; the only
# affordable structure is a SMALL FIXED SET of programs, each compiled
# once per process and reused by every tree of every size:
#
#   * all device Merkle work runs at the padded geometry
#     (PAD_ROWS = 2^21 leaf rows); real sizes ride as RUNTIME scalars
#     and index arithmetic (gathers), never as shapes;
#   * leaves are left-aligned prefixes, so the real width-c tree is
#     exactly the left-aligned subtree of the padded tree: real level i
#     is the first c/2^i nodes of padded level i;
#   * arrange+leaf program (per leaf arity A): rows[j] = [x[j + k*c]]
#     gathered from the padded evaluation buffer with c a runtime
#     scalar, then one Poseidon sponge — scan-based perm (~1K ops/body,
#     3 lax.scan) beats the unrolled body (~2.8K ops) when the program
#     is compiled once;
#   * tree program: 2 unrolled levels + the constant-shape scan to the
#     root; scan-tail levels are sliced to live prefixes in-program and
#     pulled to the host (~8 MB) so deep siblings are numpy lookups;
#   * open program (per A): jj = idx mod c; leaf rows + the 3 big-level
#     siblings in ONE dispatch for a padded query batch (QPAD);
#   * trees smaller than NATIVE_MIN_LEAVES skip the device entirely —
#     the C++ engine (native/poseidon2.cpp) hashes them host-side.
#
# Sizes are env-tunable so the CPU test mesh can exercise the same code
# path at toy geometry (tests/conftest.py sets EZT_PAD_LOG2).
import os as _os

PAD_ROWS = 1 << int(_os.environ.get("EZT_PAD_LOG2", "21"))
# second, smaller geometry for mid-size trees: a 2^18-leaf tree through
# the 2^21 programs would pay 8x padding waste in device hashing
PAD_MID = 1 << int(_os.environ.get("EZT_PAD_MID_LOG2", "18"))
NATIVE_MIN_LEAVES = 1 << int(_os.environ.get("EZT_NATIVE_MIN_LOG2", "17"))
QPAD = 128


def _scan_start(pad: int) -> int:
    # unroll 4 levels, then the constant-shape scan: the scan's
    # redundant hashing below pad/16 is ~pad/8 extra hashes (vs ~pad/4
    # of true tail work) while 4 unrolled bodies are a one-time ~2 min
    # of axon compile
    return max(pad >> 4, 1)


_LEAF_CACHE: dict = {}  # (pad, A) -> jitted arrange+leaf program
_TREE_CACHE: dict = {}  # pad -> jitted tree program
_OPEN_CACHE: dict = {}  # (pad, A) -> jitted open program


def _unroll_perms() -> bool:
    # Perm flavor by backend: the scan-based perm is ~3x fewer HLO ops
    # (what the axon remote compiler charges for), but XLA CPU's compile
    # time explodes on nested scans (the level-scan wrapping the perm's
    # three round-scans — the round-4 fused tests measured 590 s compiles
    # at toy sizes), so the CPU test mesh unrolls.
    return _jax.default_backend() == "cpu"


def _leaf_prog(pad: int, A: int):
    """evals buffer (2*PAD_ROWS,) + runtime c -> (pad, 4) leaf digests.
    Row j holds [x[j + k*c] for k < A]; rows >= c hash junk that the
    left-aligned real tree never references."""
    key = (pad, A)
    if key in _LEAF_CACHE:
        return _LEAF_CACHE[key]

    unroll = _unroll_perms()

    def run(xlo, xhi, c):
        mask = xlo.shape[0] - 1
        j = _jnp.arange(pad, dtype=_jnp.int32)[:, None]
        k = _jnp.arange(A, dtype=_jnp.int32)[None, :]
        idx = (j + k * c) & mask
        rows = GF(xlo[idx], xhi[idx])  # (pad, A)
        d = poseidon.hash_elements(rows, unroll=unroll)
        return d.lo, d.hi

    _LEAF_CACHE[key] = _jax.jit(run)
    return _LEAF_CACHE[key]


def _tree_prog(pad: int):
    if pad in _TREE_CACHE:
        return _TREE_CACHE[pad]

    unroll = _unroll_perms()
    scan_start = _scan_start(pad)

    def run(lo, hi):
        cur = GF(lo, hi)
        big = []
        while cur.lo.shape[0] > scan_start:
            even = GF(cur.lo[0::2], cur.hi[0::2])
            odd = GF(cur.lo[1::2], cur.hi[1::2])
            cur = poseidon.hash_two(even, odd, unroll=unroll)
            big.append(cur)
        n_tail = cur.lo.shape[0]
        levels_n = n_tail.bit_length() - 1

        def step(d, _):
            even = GF(d.lo[0::2], d.hi[0::2])
            odd = GF(d.lo[1::2], d.hi[1::2])
            h = poseidon.hash_two(even, odd, unroll=unroll)
            d2 = GF(
                _jnp.concatenate([h.lo, d.lo[n_tail // 2 :]], axis=0),
                _jnp.concatenate([h.hi, d.hi[n_tail // 2 :]], axis=0),
            )
            return d2, h

        if levels_n:
            _, ys = _jax.lax.scan(step, cur, None, length=levels_n)
            tail = [
                (ys.lo[i, : n_tail >> (i + 1)], ys.hi[i, : n_tail >> (i + 1)])
                for i in range(levels_n)
            ]
        else:
            tail = []
        return [(l.lo, l.hi) for l in big], tail

    _TREE_CACHE[pad] = _jax.jit(run)
    return _TREE_CACHE[pad]


def _open_prog(pad: int, A: int):
    """(idx (QPAD,), c, eval-buffer planes, digest+big-level planes) ->
    leaf VALUE rows + the device-level sibling digests, one dispatch for
    the whole padded query batch."""
    key = (pad, A)
    if key in _OPEN_CACHE:
        return _OPEN_CACHE[key]
    n_dev = pad.bit_length() - _scan_start(pad).bit_length() + 1

    def run(idx, c, xlo, xhi, *levels):
        mask = xlo.shape[0] - 1
        jj = _jnp.remainder(idx, c).astype(_jnp.int32)
        k = _jnp.arange(A, dtype=_jnp.int32)[None, :]
        vidx = (jj[:, None] + k * c) & mask
        rows = (xlo[vidx], xhi[vidx])  # (QPAD, A)
        sibs = []
        cur = jj
        for i in range(n_dev):
            llo, lhi = levels[2 * i], levels[2 * i + 1]
            sib = cur ^ 1
            sibs.append((llo[sib], lhi[sib]))
            cur = cur >> 1
        return rows, sibs

    _OPEN_CACHE[key] = _jax.jit(run)
    return _OPEN_CACHE[key]


def _u64(lo, hi) -> np.ndarray:
    return np.asarray(lo, dtype=np.uint64) | (
        np.asarray(hi, dtype=np.uint64) << np.uint64(32)
    )


class PaddedMerkleTree:
    """Device tree in padded form: leaf digests + big levels stay on
    device (opened via the shared _open_prog), scan-tail levels live on
    the host as combined-uint64 numpy arrays (real widths)."""

    def __init__(self, c: int, A: int, pad: int, ev_pad, dig_dev, big_dev, tails_np):
        self.n = c  # real leaf count
        self.A = A
        self.pad = pad  # geometry this tree was committed under
        self._ev = ev_pad  # (2*PAD_ROWS,) planes — leaf values
        self._dev_levels = [dig_dev] + list(big_dev)  # padded widths PAD..SCAN
        self._tails = tails_np  # [np uint64 (w, 4)], widths c>>n_dev .. 1

    @property
    def num_leaves(self) -> int:
        return self.n

    def root(self) -> list[int]:
        if self._tails:
            return [int(v) for v in self._tails[-1][0]]
        # degenerate: real tree fits inside the device levels (c small)
        raise AssertionError("padded tree requires c > device-level count")

    def open_with_rows(self, indices):
        """One dispatch: ([rows (q, A) uint64], [paths[q][level][4]])."""
        idx = np.asarray(list(indices), dtype=np.int64)
        q = len(idx)
        assert q <= QPAD, "query batch exceeds QPAD"
        pad_idx = np.zeros((QPAD,), dtype=np.int32)
        pad_idx[:q] = idx % self.n
        flat = []
        for lo, hi in self._dev_levels:
            flat += [lo, hi]
        rows, sibs = _open_prog(self.pad, self.A)(
            _jnp.asarray(pad_idx), _jnp.int32(self.n),
            self._ev[0], self._ev[1], *flat,
        )
        (rlo, rhi), sibs_np = _jax.device_get((rows, sibs))
        rows_u = _u64(rlo, rhi)[:q]
        n_dev = len(self._dev_levels)
        depth = self.n.bit_length() - 1
        paths = []
        for qi in range(q):
            j = int(idx[qi]) % self.n
            path = []
            for li in range(depth):
                if li < n_dev:
                    lo, hi = sibs_np[li]
                    path.append([
                        int(np.uint64(lo[qi][d]) | (np.uint64(hi[qi][d]) << np.uint64(32)))
                        for d in range(4)
                    ])
                else:
                    lvl = self._tails[li - n_dev]
                    path.append([int(v) for v in lvl[(j >> li) ^ 1]])
            paths.append(path)
        return rows_u, paths

    def open(self, index: int):
        return self.open_many([index])[0]

    def open_many(self, indices):
        return self.open_with_rows(indices)[1]


def _commit_native(leaves: GF) -> MerkleTree:
    """C++ host commit for small trees: zero device work."""
    from ..native import poseidon2 as nps

    rows = gl.to_int(leaves)
    if rows.ndim == 1:
        rows = rows[:, None]
    digests = nps.hash_elements(np.ascontiguousarray(rows))
    levels = [gl.from_int_np(digests)]
    for lv in nps.tree(digests):
        levels.append(gl.from_int_np(lv))
    return MerkleTree(levels=levels)


def commit_evals_device(ev_pad, c: int, A: int) -> PaddedMerkleTree:
    """Commit the (c, A)-arranged tree of a PADDED evaluation buffer
    (planes of shape (2*PAD_ROWS,), live prefix c*A, left-aligned) — the
    layered FRI prover's commit step, all shared fixed-shape programs.
    Geometry by size: trees up to PAD_MID leaves use the smaller program
    set (8x less padding waste for the mid FRI layers)."""
    pad = PAD_MID if c <= PAD_MID else PAD_ROWS
    n_dev = pad.bit_length() - _scan_start(pad).bit_length() + 1
    assert c * A <= 2 * PAD_ROWS and c >= (1 << n_dev)
    dlo, dhi = _leaf_prog(pad, A)(ev_pad[0], ev_pad[1], _jnp.int32(c))
    big, tail_dev = _tree_prog(pad)(dlo, dhi)
    tails_all = _jax.device_get(tail_dev)
    tails_np = []
    width = c >> n_dev
    for tlo, thi in tails_all:
        if width < 1:
            break
        tails_np.append(_u64(np.asarray(tlo)[:width], np.asarray(thi)[:width]))
        width >>= 1
    return PaddedMerkleTree(
        c=c, A=A, pad=pad, ev_pad=ev_pad, dig_dev=(dlo, dhi),
        big_dev=big, tails_np=tails_np,
    )


def commit_leaves(leaves: GF, prefer_host: bool | None = None) -> MerkleTree:
    """Hash (N, k) field-element rows to digests, then build the tree.

    prefer_host=None auto-selects: vectorized numpy Poseidon on CPU
    backends (test mesh), the C++ native engine on accelerator backends.
    Generic row shapes never touch the device — on the remote-compile
    TPU backend every new (N, k) shape would pay minutes of cold compile
    (measured round 5); hot-path callers with eval-vector leaves use the
    shared fixed-shape `commit_evals_device` pipeline instead."""
    import jax

    if prefer_host is None:
        prefer_host = jax.default_backend() == "cpu"
    if prefer_host:
        return _commit_leaves_host(leaves)
    try:
        return _commit_native(leaves)
    except Exception:
        return _commit_leaves_host(leaves)


def verify_path(
    root: list[int], index: int, leaf_values: list[int], path: list[list[int]]
) -> bool:
    """Host-side path check: leaf row -> digest -> fold siblings to root."""
    digest = poseidon.hash_elements_host([int(v) for v in leaf_values])
    idx = index
    for sib in path:
        if idx & 1:
            digest = poseidon.hash_two_host(sib, digest)
        else:
            digest = poseidon.hash_two_host(digest, sib)
        idx >>= 1
    return digest == [int(v) for v in root]


def leaf_row(leaves: GF, index: int) -> list[int]:
    """Pull one leaf row to host ints (for building openings)."""
    row = gl.to_int(GF(leaves.lo[index], leaves.hi[index]))
    return [int(v) for v in np.atleast_1d(row)]
