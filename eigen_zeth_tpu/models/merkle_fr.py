"""Poseidon2-Fr Merkle tree — the SNARK-friendly vector commitment of the
final-wrap layer (models/air_wrap.py).

Same shape as models/merkle.py (device bulk construction, host bigint
verification) with two wrap-specific choices:
  * digests are ONE Fr element (capacity-1 sponge), so an opening path is
    one field element per level and the in-circuit path check is one
    Poseidon2-Fr permutation per level (~492 R1CS constraints);
  * leaves are Goldilocks rows PACKED 3-per-Fr (ops/poseidon_fr.pack_*),
    which cuts leaf-hash permutations 3x both on device and in-circuit —
    the circuit's 64-bit unpack decompositions double as the range checks
    its lazy GL arithmetic needs anyway.

Reference seam: the wrap layer replaces the host-trust step the round-3
pipeline still had (prover-side `_validate_recursive` before the Groth16
wrap — docs/RECURSION.md:130-155); the reference's on-chain verifier
consumes only the wrapped proof (src/settlement/ethereum/mod.rs:338-394).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import poseidon_fr as pfr
from ..ops.goldilocks import GF


@dataclass
class MerkleTreeFr:
    """levels[0] = leaf digests (python-int list or np object) ...
    levels[-1] = [root].  Digest = one Fr element."""

    levels: List[list]

    @property
    def num_leaves(self) -> int:
        return len(self.levels[0])

    def root(self) -> int:
        return int(self.levels[-1][0])

    def open_many(self, indices) -> list[list[int]]:
        """[path[level] for level] per index; each path entry is the
        sibling digest (one Fr element)."""
        out = []
        for index in indices:
            path = []
            cur = int(index)
            for level in self.levels[:-1]:
                path.append(int(level[cur ^ 1]))
                cur >>= 1
            out.append(path)
        return out

    def open(self, index: int) -> list[int]:
        return self.open_many([index])[0]


# ---------------------------------------------------------------------------
# host construction (CPU backends / small trees)


def _leaf_digests_host(packed_rows: list[list[int]]) -> list[int]:
    return [pfr.hash_elements_host(row, tag="leaf") for row in packed_rows]


def commit_packed_host(packed_rows: list[list[int]]) -> MerkleTreeFr:
    n = len(packed_rows)
    assert n & (n - 1) == 0 and n >= 1
    level = _leaf_digests_host(packed_rows)
    levels = [level]
    while len(level) > 1:
        level = [
            pfr.hash_two_host(level[i], level[i + 1]) for i in range(0, len(level), 2)
        ]
        levels.append(level)
    return MerkleTreeFr(levels=levels)


# ---------------------------------------------------------------------------
# device construction (TPU: bulk Montgomery limb planes)


def _sponge_tag_mont(tag: str, extra: int, n: int):
    ctx = pfr._ctx()
    v = (pfr._sha_to_fr("ezt-pfr-sponge/" + tag) + extra) % pfr.R
    return ctx.const_mont(v, (n,))


@jax.jit
def _leaf_digests_device(packed_mont):
    """(L, N, K) Montgomery packed rows -> (L, N) leaf digests."""
    ctx = pfr._ctx()
    L, n, k = packed_mont.shape
    n_blocks = -(-k // pfr.RATE)
    pad = n_blocks * pfr.RATE - k
    if pad:
        packed_mont = jnp.concatenate(
            [packed_mont, jnp.zeros((L, n, pad), dtype=jnp.uint32)], axis=2
        )
    state = jnp.zeros((L, pfr.WIDTH, n), dtype=jnp.uint32)
    state = state.at[:, pfr.WIDTH - 1].set(_sponge_tag_mont("leaf", k, n))
    for b in range(n_blocks):
        blk = jnp.moveaxis(
            packed_mont[:, :, b * pfr.RATE : (b + 1) * pfr.RATE], 2, 1
        )  # (L, RATE, N)
        absorbed = ctx.add(
            state[:, : pfr.RATE].reshape(L, -1),
            blk.reshape(L, -1),
        ).reshape(L, pfr.RATE, n)
        state = jnp.concatenate([absorbed, state[:, pfr.RATE :]], axis=1)
        state = pfr.perm_device(state)
    return state[:, 0]  # (L, N)


@jax.jit
def _compress_level_device(digests):
    """(L, N) -> (L, N/2) via one permutation per pair."""
    L, n = digests.shape
    left = digests[:, 0::2]
    right = digests[:, 1::2]
    state = jnp.zeros((L, pfr.WIDTH, n // 2), dtype=jnp.uint32)
    state = state.at[:, 0].set(left)
    state = state.at[:, 1].set(right)
    state = state.at[:, pfr.WIDTH - 1].set(_sponge_tag_mont("node", 0, n // 2))
    return pfr.perm_device(state)[:, 0]


def commit_rows_gl(rows: GF, prefer_host: bool | None = None) -> MerkleTreeFr:
    """Commit (N, C) Goldilocks rows (canonical values) under Poseidon2-Fr.

    Auto path selection mirrors merkle.commit_leaves: host bigints on CPU
    backends (tests), bulk Montgomery device work on TPU."""
    if prefer_host is None:
        # Round 5: the C++ Fr engine (native/poseidon_fr.cpp, ~30x the
        # python bigint hasher) makes host commits the default everywhere
        # — on the remote-compile TPU backend the device tree's per-shape
        # cold compile dwarfs the work, and on CPU the XLA compile of
        # the Fr perm graph was the round-4 suite pathology.
        prefer_host = True
    if prefer_host:
        from ..native import poseidon_fr as nfr
        from ..ops import goldilocks as gl

        ints = gl.to_int(rows)
        ints = np.atleast_2d(ints)
        packed = [pfr.pack_gl_host([int(v) for v in row]) for row in ints]
        if nfr.available() and len(packed) >= 64:
            k = len(packed[0])
            arr = np.stack([nfr.to_limbs(rw) for rw in packed])
            cap_leaf = (pfr._sha_to_fr("ezt-pfr-sponge/leaf") + k) % pfr.R
            digests = nfr.hash_rows(arr, cap_leaf)
            cap_node = pfr._sha_to_fr("ezt-pfr-sponge/node")
            levels = [nfr.from_limbs(digests)]
            for lv in nfr.tree(digests, cap_node):
                levels.append(nfr.from_limbs(lv))
            return MerkleTreeFr(levels=levels)
        return commit_packed_host(packed)
    packed = pfr.pack_gl_device(rows.lo, rows.hi)  # (L, N, K) non-mont
    packed_m = pfr.to_mont(packed)
    digests = _leaf_digests_device(packed_m)
    ctx = pfr._ctx()
    levels_dev = [digests]
    cur = digests
    while cur.shape[1] > 1:
        cur = _compress_level_device(cur)
        levels_dev.append(cur)
    levels = [[int(v) for v in ctx.to_int(lv)] for lv in levels_dev]
    return MerkleTreeFr(levels=levels)


# ---------------------------------------------------------------------------
# host verification


def verify_path_packed(
    root: int, index: int, packed_row: list[int], path: list[int]
) -> bool:
    digest = pfr.hash_elements_host([int(v) % pfr.R for v in packed_row], tag="leaf")
    idx = int(index)
    for sib in path:
        if idx & 1:
            digest = pfr.hash_two_host(int(sib), digest)
        else:
            digest = pfr.hash_two_host(digest, int(sib))
        idx >>= 1
    return digest == int(root)


def verify_path_gl(
    root: int, index: int, leaf_values: list[int], path: list[int]
) -> bool:
    """Leaf given as raw Goldilocks values (packed on the fly)."""
    return verify_path_packed(root, index, pfr.pack_gl_host(leaf_values), path)
