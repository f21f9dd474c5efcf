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
    """Host-bigint commit: on CPU backends the per-op dispatch overhead of
    the eager device path dwarfs the math (~1s vs ~3ms per permutation);
    production TPU runs use the device path."""
    rows = gl.to_int(leaves)
    if rows.ndim == 1:
        rows = rows[:, None]
    level = [poseidon.hash_elements_host([int(v) for v in row]) for row in rows]
    levels_int = [level]
    while len(level) > 1:
        level = [
            poseidon.hash_two_host(level[i], level[i + 1])
            for i in range(0, len(level), 2)
        ]
        levels_int.append(level)
    levels = [
        gl.from_int_np(np.array(lv, dtype=np.uint64)) for lv in levels_int
    ]
    return MerkleTree(levels=levels)


import jax as _jax
import jax.numpy as _jnp


# below this level width the constant-shape scan's redundant hashing is
# cheaper than more unrolled hash_two subgraphs (compile time)
UNROLL_MIN = 4096


@_jax.jit
def _commit_device_run(lo, hi):
    """One jitted program: leaf digests + every tree level.

    Hybrid schedule: levels wider than UNROLL_MIN are unrolled with true
    halving shapes — the work is the ~2n hashes the tree actually needs.
    The tail levels use the constant-shape lax.scan trick (each step
    hashes ALL n_tail/2 adjacent pairs of a fixed-size working array;
    the live level occupies a halving prefix) — one hash_two body in the
    trace for log2(n_tail) levels.  The round-2 all-scan version hashed
    n/2 lanes at EVERY level, (log2 n)/2 × the true work — measured ~10x
    excess at 2^21-leaf trees.  Module-level jit so the executable
    caches per shape."""
    digests = poseidon.hash_elements(GF(lo, hi))  # (n, 4)
    big = []
    cur = digests
    while cur.lo.shape[0] > UNROLL_MIN:
        even = GF(cur.lo[0::2], cur.hi[0::2])
        odd = GF(cur.lo[1::2], cur.hi[1::2])
        cur = poseidon.hash_two(even, odd)
        big.append(cur)
    n_tail = cur.lo.shape[0]
    levels_n = n_tail.bit_length() - 1

    def step(d, _):
        even = GF(d.lo[0::2], d.hi[0::2])
        odd = GF(d.lo[1::2], d.hi[1::2])
        h = poseidon.hash_two(even, odd)  # (n_tail/2, 4)
        d2 = GF(
            _jnp.concatenate([h.lo, d.lo[n_tail // 2 :]], axis=0),
            _jnp.concatenate([h.hi, d.hi[n_tail // 2 :]], axis=0),
        )
        return d2, h

    if levels_n:
        _, ys = _jax.lax.scan(step, cur, None, length=levels_n)
    else:
        ys = gl.zeros((0, n_tail // 2 if n_tail > 1 else 1, 4))
    return digests, big, ys


def _commit_device_jit(leaves: GF):
    n = leaves.lo.shape[0]
    digests, big, ys = _commit_device_run(leaves.lo, leaves.hi)
    levels = [digests] + list(big)
    n_tail = levels[-1].lo.shape[0]
    for k in range(n_tail.bit_length() - 1):
        live = n_tail >> (k + 1)
        levels.append(GF(ys.lo[k, :live], ys.hi[k, :live]))
    return levels


def commit_leaves(leaves: GF, prefer_host: bool | None = None) -> MerkleTree:
    """Hash (N, k) field-element rows to digests, then build the tree.

    prefer_host=None auto-selects: host bigints on CPU backends (test
    mesh), one jitted device program on TPU."""
    import jax

    if prefer_host is None:
        prefer_host = jax.default_backend() == "cpu"
    if prefer_host:
        return _commit_leaves_host(leaves)
    return MerkleTree(levels=_commit_device_jit(leaves))


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
