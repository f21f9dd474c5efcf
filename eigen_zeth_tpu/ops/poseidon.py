"""Poseidon permutation over Goldilocks — the prover's transcript hash.

Fills the Poseidon/Merkle role of the reference's external eigen-prover
(SURVEY.md §2.9-bis; BASELINE config 2: Poseidon hash chain + Merkle commit
over 2^16 leaves).  The reference repo publishes no Poseidon parameters —
its proving service is external — so this framework pins its own,
generated deterministically and documented here:

  * width t = 12 (rate 8, capacity 4), S-box x^7,
    R_F = 8 full rounds, R_P = 22 partial rounds
    (the standard parameterization for Goldilocks at 128-bit security).
  * Round constants: SHA-256("ezt-poseidon-gl12/rc/{round}/{lane}")
    reduced mod p — nothing-up-my-sleeve, reproducible from this file.
  * MDS matrix: the Cauchy matrix M[i][j] = 1/(x_i + y_j) with x_i = i,
    y_j = t + j; provably MDS since all x_i and y_j are distinct and
    x_i + y_j is never 0 mod p.

Two implementations kept bit-identical by tests:
  * device: vectorized over a batch axis, state shape (..., 12) GF —
    partial-round S-box touches lane 0 only, MDS as broadcasted mul +
    log-depth tree sum (all uint32 VPU work, jit-safe).
  * host: python bigints — used by the verifier and the Fiat-Shamir
    transcript, and as the independent test reference.
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from .goldilocks import GF

WIDTH = 12
RATE = 8
CAPACITY = 4
DIGEST = 4
FULL_ROUNDS = 8
PARTIAL_ROUNDS = 22
N_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS
ALPHA = 7


def _sha_to_field(tag: str) -> int:
    """Map a domain-separation tag to a canonical field element.

    Rejection-free: 32 SHA bytes mod p (bias ~2^-192, irrelevant here)."""
    h = hashlib.sha256(tag.encode()).digest()
    return int.from_bytes(h, "big") % gl.P


@functools.lru_cache(maxsize=1)
def round_constants() -> list[list[int]]:
    return [
        [_sha_to_field(f"ezt-poseidon-gl12/rc/{r}/{i}") for i in range(WIDTH)]
        for r in range(N_ROUNDS)
    ]


@functools.lru_cache(maxsize=1)
def mds_matrix() -> list[list[int]]:
    return [
        [gl.h_inv((i + WIDTH + j) % gl.P) for j in range(WIDTH)]
        for i in range(WIDTH)
    ]


# ---------------------------------------------------------------------------
# host (python bigint) implementation — verifier + transcript + test oracle


def _sbox_host(x: int) -> int:
    return pow(x, ALPHA, gl.P)


def perm_host(state: list[int]) -> list[int]:
    assert len(state) == WIDTH
    rc = round_constants()
    mds = mds_matrix()
    s = [x % gl.P for x in state]
    half = FULL_ROUNDS // 2
    for r in range(N_ROUNDS):
        s = [(x + c) % gl.P for x, c in zip(s, rc[r])]
        if half <= r < half + PARTIAL_ROUNDS:
            s[0] = _sbox_host(s[0])
        else:
            s = [_sbox_host(x) for x in s]
        s = [sum(mds[i][j] * s[j] for j in range(WIDTH)) % gl.P for i in range(WIDTH)]
    return s


def hash_elements_host(elements: list[int]) -> list[int]:
    """Sponge: absorb in rate-8 blocks (zero-padded), squeeze a 4-element
    digest.  Length is absorbed into the capacity as domain separation."""
    state = [0] * WIDTH
    state[RATE] = len(elements) % gl.P
    for i in range(0, max(len(elements), 1), RATE):
        block = elements[i : i + RATE]
        for j, v in enumerate(block):
            state[j] = (state[j] + v) % gl.P
        state = perm_host(state)
    return state[:DIGEST]


def hash_two_host(left: list[int], right: list[int]) -> list[int]:
    """2-to-1 digest compression for Merkle interior nodes."""
    state = list(left) + list(right) + [0] * (WIDTH - 2 * DIGEST)
    return perm_host(state)[:DIGEST]


# ---------------------------------------------------------------------------
# device (JAX) implementation — bulk hashing on TPU


def _sum_last_axis(x: GF) -> GF:
    """Log-depth pairwise field-add reduction over the last axis."""
    n = x.lo.shape[-1]
    while n > 1:
        if n % 2:
            pad = [(0, 0)] * (x.lo.ndim - 1) + [(0, 1)]
            x = GF(jnp.pad(x.lo, pad), jnp.pad(x.hi, pad))
            n += 1
        a = GF(x.lo[..., 0::2], x.hi[..., 0::2])
        b = GF(x.lo[..., 1::2], x.hi[..., 1::2])
        x = gl.add(a, b)
        n //= 2
    return GF(x.lo[..., 0], x.hi[..., 0])


@functools.lru_cache(maxsize=1)
def _device_constants():
    # numpy planes: cached jnp arrays created inside a jit trace would
    # leak tracers into later traces
    rc = gl.from_int_np(np.array(round_constants(), dtype=np.uint64))  # (30, 12)
    mds = gl.from_int_np(np.array(mds_matrix(), dtype=np.uint64))  # (12, 12)
    return rc, mds


def _sbox(x: GF) -> GF:
    x2 = gl.square(x)
    x4 = gl.square(x2)
    x6 = gl.mul(x4, x2)
    return gl.mul(x6, x)


def perm(state: GF) -> GF:
    """Poseidon permutation; state shape (..., 12), vectorized over batch.

    One lax.scan over the 30 rounds (round constants + full/partial flag
    scanned in): the traced graph is ONE round body, not 30 unrolled
    rounds — the unrolled form made Merkle-commit graphs take minutes of
    XLA compile once leaves grew to 100+ columns (14 chained perms)."""
    assert state.lo.shape[-1] == WIDTH
    rc, mds = _device_constants()
    half = FULL_ROUNDS // 2
    is_full = jnp.asarray(
        np.array(
            [not (half <= r < half + PARTIAL_ROUNDS) for r in range(N_ROUNDS)]
        )
    )

    def body(st: GF, inp):
        c, full_r = inp
        st = gl.add(st, GF(jnp.broadcast_to(c.lo, st.lo.shape),
                           jnp.broadcast_to(c.hi, st.hi.shape)))
        sb_all = _sbox(st)
        # partial rounds sbox lane 0 only: select per round
        lane_mask = jnp.arange(WIDTH) == 0
        keep = jnp.logical_or(full_r, lane_mask)
        sb = gl.select(keep, sb_all, st)
        m2 = GF(sb.lo[..., None, :], sb.hi[..., None, :])
        prod = gl.mul(
            GF(jnp.broadcast_to(m2.lo, m2.lo.shape[:-2] + (WIDTH, WIDTH)),
               jnp.broadcast_to(m2.hi, m2.hi.shape[:-2] + (WIDTH, WIDTH))),
            GF(jnp.broadcast_to(mds.lo, m2.lo.shape[:-2] + (WIDTH, WIDTH)),
               jnp.broadcast_to(mds.hi, m2.hi.shape[:-2] + (WIDTH, WIDTH))),
        )
        return _sum_last_axis(prod), None

    state, _ = jax.lax.scan(body, state, (GF(rc.lo, rc.hi), is_full))
    return state


def hash_elements(elements: GF) -> GF:
    """Device sponge over the last axis: (..., k) -> (..., 4) digests.

    Bit-identical to hash_elements_host on each batch row."""
    k = elements.lo.shape[-1]
    batch = elements.lo.shape[:-1]
    state = gl.zeros(batch + (WIDTH,))
    state = GF(
        state.lo.at[..., RATE].set(jnp.uint32(k & 0xFFFFFFFF)),
        state.hi.at[..., RATE].set(jnp.uint32(k >> 32)),
    )
    nblocks = max(1, (k + RATE - 1) // RATE)
    for i in range(nblocks):
        block = GF(
            elements.lo[..., i * RATE : i * RATE + RATE],
            elements.hi[..., i * RATE : i * RATE + RATE],
        )
        blen = block.lo.shape[-1]
        if blen < RATE:
            pad = [(0, 0)] * (block.lo.ndim - 1) + [(0, RATE - blen)]
            block = GF(jnp.pad(block.lo, pad), jnp.pad(block.hi, pad))
        first = GF(state.lo[..., :RATE], state.hi[..., :RATE])
        summed = gl.add(first, block)
        state = GF(
            jnp.concatenate([summed.lo, state.lo[..., RATE:]], axis=-1),
            jnp.concatenate([summed.hi, state.hi[..., RATE:]], axis=-1),
        )
        state = perm(state)
    return GF(state.lo[..., :DIGEST], state.hi[..., :DIGEST])


def hash_two(left: GF, right: GF) -> GF:
    """Device 2-to-1 compression: (..., 4) x (..., 4) -> (..., 4)."""
    batch = left.lo.shape[:-1]
    zeros = gl.zeros(batch + (WIDTH - 2 * DIGEST,))
    state = GF(
        jnp.concatenate([left.lo, right.lo, zeros.lo], axis=-1),
        jnp.concatenate([left.hi, right.hi, zeros.hi], axis=-1),
    )
    out = perm(state)
    return GF(out.lo[..., :DIGEST], out.hi[..., :DIGEST])
