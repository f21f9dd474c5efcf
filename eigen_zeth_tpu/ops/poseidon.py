"""Poseidon2 permutation over Goldilocks — the prover's transcript hash.

Fills the Poseidon/Merkle role of the reference's external eigen-prover
(SURVEY.md §2.9-bis; BASELINE config 2: Poseidon hash chain + Merkle commit
over 2^16 leaves).  The reference repo publishes no Poseidon parameters —
its proving service is external — so this framework pins its own instance,
generated deterministically and documented here.

Why Poseidon2 (round 3): the round-2 instance used a dense Cauchy MDS —
144 full-width field multiplies per round, ~340K uint32 ops per
permutation, measured 0.84M perms/s on v5e and dominating the FRI/STARK
commit runtime.  Poseidon2 (Grassi-Khovratovich-Schofnegger, 2023-style
construction) replaces the linear layers with
  * an EXTERNAL matrix M_E = circ(2·M4, M4, M4) built from the 4x4
    integer matrix M4 = [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]] —
    multiplication is ~44 field additions, zero multiplies;
  * an INTERNAL matrix M_I = 1 (all-ones) + diag(mu_i): one lane sum
    plus 12 constant multiplies per partial round;
and applies M_E once more to the input (defence of the first rounds).
Internal-round constants are added to lane 0 only.

Parameters (128-bit target, standard for Goldilocks x^7):
  * width t = 12 (rate 8, capacity 4), S-box x^7,
    R_F = 8 full rounds (4 + 4), R_P = 22 internal rounds.
  * Round constants: SHA-256("ezt-poseidon2-gl12/rc/{round}/{lane}")
    reduced mod p (internal rounds: lane 0 only) — nothing-up-my-sleeve.
  * Internal diagonal: mu_i = SHA-256("ezt-poseidon2-gl12/diag/{i}")
    reduced mod p (full-width, matching the paper's random-diagonal
    sampling; a zero/one value would be resampled — none occur).

Two implementations kept bit-identical by tests:
  * device: lane-major (12, N) row vectors inside a lax.scan over
    rounds — M_E as unrolled adds, M_I as lane sum + constant muls, all
    full-lane-width VPU work (the round-2 broadcast-MDS layout ran
    minor-axis reductions at ~9% lane utilization).
  * host: python bigints — the verifier, the Fiat-Shamir transcript, and
    the independent test reference.
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

# Poseidon2's 4x4 building block; circ(2*M4, M4, M4) is MDS-enough for the
# external layer per the Poseidon2 construction
M4 = (
    (5, 7, 1, 3),
    (4, 6, 1, 1),
    (1, 3, 5, 7),
    (1, 1, 4, 6),
)


def _sha_to_field(tag: str) -> int:
    """Map a domain-separation tag to a canonical field element.

    Rejection-free: 32 SHA bytes mod p (bias ~2^-192, irrelevant here)."""
    h = hashlib.sha256(tag.encode()).digest()
    return int.from_bytes(h, "big") % gl.P


def _is_full_round(r: int) -> bool:
    half = FULL_ROUNDS // 2
    return r < half or r >= half + PARTIAL_ROUNDS


@functools.lru_cache(maxsize=1)
def round_constants() -> list[list[int]]:
    """Per-round additive constants; internal rounds use lane 0 only
    (lanes 1..11 are zero there, so AIR selector patterns stay uniform)."""
    out = []
    for r in range(N_ROUNDS):
        if _is_full_round(r):
            out.append(
                [_sha_to_field(f"ezt-poseidon2-gl12/rc/{r}/{i}") for i in range(WIDTH)]
            )
        else:
            out.append(
                [_sha_to_field(f"ezt-poseidon2-gl12/rc/{r}/0")] + [0] * (WIDTH - 1)
            )
    return out


@functools.lru_cache(maxsize=1)
def internal_diag() -> list[int]:
    """mu_i of the internal matrix M_I = allones + diag(mu)."""
    out = []
    for i in range(WIDTH):
        v = _sha_to_field(f"ezt-poseidon2-gl12/diag/{i}")
        assert v not in (0,), "degenerate diagonal draw"
        out.append(v)
    return out


@functools.lru_cache(maxsize=1)
def external_matrix() -> list[list[int]]:
    """The dense 12x12 external matrix circ(2*M4, M4, M4) (for the AIR's
    matvec constraint; the device/host perms use the addition chain)."""
    m = [[0] * WIDTH for _ in range(WIDTH)]
    for bi in range(3):
        for bj in range(3):
            mult = 2 if bi == bj else 1
            for i in range(4):
                for j in range(4):
                    m[4 * bi + i][4 * bj + j] = mult * M4[i][j]
    return m


@functools.lru_cache(maxsize=1)
def internal_matrix() -> list[list[int]]:
    """Dense M_I = allones + diag(mu) (for the AIR's matvec constraint)."""
    mu = internal_diag()
    return [
        [(1 + mu[i]) % gl.P if i == j else 1 for j in range(WIDTH)]
        for i in range(WIDTH)
    ]


# backwards-compatible name: the AIR historically called this mds_matrix;
# it now refers to the external (full-round) matrix
def mds_matrix() -> list[list[int]]:
    return external_matrix()


# ---------------------------------------------------------------------------
# host (python bigint) implementation — verifier + transcript + test oracle


def _sbox_host(x: int) -> int:
    return pow(x, ALPHA, gl.P)


def _m4_block_host(x: list[int]) -> list[int]:
    """M4 · x via the Poseidon2 addition chain (values mod p)."""
    t0 = (x[0] + x[1]) % gl.P
    t1 = (x[2] + x[3]) % gl.P
    t2 = (2 * x[1] + t1) % gl.P
    t3 = (2 * x[3] + t0) % gl.P
    t4 = (4 * t1 + t3) % gl.P
    t5 = (4 * t0 + t2) % gl.P
    t6 = (t3 + t5) % gl.P
    t7 = (t2 + t4) % gl.P
    return [t6, t5, t7, t4]


def _external_host(s: list[int]) -> list[int]:
    z = [_m4_block_host(s[4 * b : 4 * b + 4]) for b in range(3)]
    tot = [(z[0][i] + z[1][i] + z[2][i]) % gl.P for i in range(4)]
    out = []
    for b in range(3):
        out += [(z[b][i] + tot[i]) % gl.P for i in range(4)]
    return out


def _internal_host(s: list[int]) -> list[int]:
    mu = internal_diag()
    tot = sum(s) % gl.P
    return [(tot + mu[i] * s[i]) % gl.P for i in range(WIDTH)]


def perm_host(state: list[int]) -> list[int]:
    assert len(state) == WIDTH
    rc = round_constants()
    s = [x % gl.P for x in state]
    s = _external_host(s)  # initial linear layer
    for r in range(N_ROUNDS):
        if _is_full_round(r):
            s = [_sbox_host((x + c) % gl.P) for x, c in zip(s, rc[r])]
            s = _external_host(s)
        else:
            s = list(s)
            s[0] = _sbox_host((s[0] + rc[r][0]) % gl.P)
            s = _internal_host(s)
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
# vectorized NUMPY implementation — host Merkle tails + CPU-backend bulk
# hashing.  Bit-identical to perm_host (tested); used where the device
# round-trip is not worth it: the sub-TAIL levels of layered FRI trees
# (models/fri_layered.py) and the host commit path the CPU test mesh
# takes (merkle._commit_leaves_host row-by-row bigints were the test
# suite's dominant cost).


def np_perm(states: np.ndarray) -> np.ndarray:
    """Poseidon2 over (n, 12) canonical uint64 rows -> (n, 12)."""
    s = np.ascontiguousarray(np.asarray(states, dtype=np.uint64).T)  # (12, n)
    rc = round_constants()
    mu = np.asarray(internal_diag(), dtype=np.uint64)
    half = FULL_ROUNDS // 2
    mm, am, sm = gl.np_mulmod, gl.np_addmod, gl.np_submod

    def dbl(x):
        return am(x, x)

    def external(s):
        # s: (12, n) -> M_E · s via the M4 addition chain on (3, n) blocks
        b = s.reshape(3, 4, -1)
        x0, x1, x2, x3 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        t0 = am(x0, x1)
        t1 = am(x2, x3)
        t2 = am(dbl(x1), t1)
        t3 = am(dbl(x3), t0)
        t4 = am(dbl(dbl(t1)), t3)
        t5 = am(dbl(dbl(t0)), t2)
        t6 = am(t3, t5)
        t7 = am(t2, t4)
        z = np.stack([t6, t5, t7, t4], axis=1)  # (3, 4, n)
        tot = am(am(z[0], z[1]), z[2])  # (4, n)
        return am(z, tot[None]).reshape(12, -1)

    def sbox(x):
        x2 = mm(x, x)
        x4 = mm(x2, x2)
        return mm(mm(x4, x2), x)

    s = external(s)
    for r in range(N_ROUNDS):
        if _is_full_round(r):
            c = np.asarray(rc[r], dtype=np.uint64)[:, None]
            s = external(sbox(am(s, c)))
        else:
            s0 = sbox(am(s[0], np.uint64(rc[r][0])))
            s = np.concatenate([s0[None], s[1:]], axis=0)
            tot = s[0]
            for i in range(1, WIDTH):
                tot = am(tot, s[i])
            s = am(tot[None], mm(s, mu[:, None]))
    return np.ascontiguousarray(s.T)


def np_hash_elements(rows: np.ndarray) -> np.ndarray:
    """Vectorized sponge over (n, k) uint64 rows -> (n, 4) digests.
    Row-identical to hash_elements_host."""
    rows = np.atleast_2d(np.asarray(rows, dtype=np.uint64))
    n, k = rows.shape
    state = np.zeros((n, WIDTH), dtype=np.uint64)
    state[:, RATE] = k % gl.P
    for i in range(0, max(k, 1), RATE):
        block = rows[:, i : i + RATE]
        state[:, : block.shape[1]] = gl.np_addmod(
            state[:, : block.shape[1]], block
        )
        state = np_perm(state)
    return state[:, :DIGEST]


def np_hash_two(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Vectorized 2-to-1 compression: (n, 4) x (n, 4) -> (n, 4)."""
    left = np.atleast_2d(np.asarray(left, dtype=np.uint64))
    right = np.atleast_2d(np.asarray(right, dtype=np.uint64))
    n = left.shape[0]
    state = np.zeros((n, WIDTH), dtype=np.uint64)
    state[:, :DIGEST] = left
    state[:, DIGEST : 2 * DIGEST] = right
    return np_perm(state)[:, :DIGEST]


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


def _sbox(x: GF) -> GF:
    x2 = gl.square(x)
    x4 = gl.square(x2)
    x6 = gl.mul(x4, x2)
    return gl.mul(x6, x)


def _dbl(x: GF) -> GF:
    return gl.add(x, x)


def _m4_block(rows: list[GF]) -> list[GF]:
    """M4 over 4 row vectors (each (..., n)) — the addition chain."""
    x0, x1, x2, x3 = rows
    t0 = gl.add(x0, x1)
    t1 = gl.add(x2, x3)
    t2 = gl.add(_dbl(x1), t1)
    t3 = gl.add(_dbl(x3), t0)
    t4 = gl.add(_dbl(_dbl(t1)), t3)
    t5 = gl.add(_dbl(_dbl(t0)), t2)
    t6 = gl.add(t3, t5)
    t7 = gl.add(t2, t4)
    return [t6, t5, t7, t4]


def _external_rows(rows: list[GF]) -> list[GF]:
    z = [_m4_block(rows[4 * b : 4 * b + 4]) for b in range(3)]
    tot = [gl.add(gl.add(z[0][i], z[1][i]), z[2][i]) for i in range(4)]
    out = []
    for b in range(3):
        out += [gl.add(z[b][i], tot[i]) for i in range(4)]
    return out


def _internal_rows(rows: list[GF]) -> list[GF]:
    mu = internal_diag()
    tot = rows[0]
    for r in rows[1:]:
        tot = gl.add(tot, r)
    return [gl.add(tot, gl.mul_scalar(rows[i], mu[i])) for i in range(WIDTH)]


def _rows_of(state: GF) -> list[GF]:
    return [GF(state.lo[i], state.hi[i]) for i in range(WIDTH)]


def _stack_rows(rows: list[GF]) -> GF:
    return gl.stack(rows, axis=0)


def _perm_unrolled(x: GF) -> GF:
    """Scan-free perm over a (12, n) lane-major state.

    Round-5 compile-time attack: the scan-based perm below keeps the
    traced graph small but costs THREE lax.scan instances per perm — and
    on the axon remote-compile backend, compile time is dominated by
    scan/loop instances (~15 s each, measured round 4: the 2^22 fused
    FRI graph with ~150 scan instances compiled in 2888 s while the
    scan-free four-step NTT compiled in 28-230 s).  This variant unrolls
    all 30 rounds as full-plane vector ops — ~2K HLO ops, zero scans —
    so Merkle/FRI commit programs built from it compile like the NTT.
    Bit-identical to perm_host (tested)."""
    rc = round_constants()
    half = FULL_ROUNDS // 2
    n = x.lo.shape[-1]

    def bcast(g: GF, shape) -> GF:
        return GF(jnp.broadcast_to(g.lo, shape), jnp.broadcast_to(g.hi, shape))

    def external(s: GF) -> GF:
        b = gl.reshape(s, (3, 4, n))
        rows = [GF(b.lo[:, i], b.hi[:, i]) for i in range(4)]  # (3, n) each
        t6, t5, t7, t4 = _m4_block(rows)
        z = gl.stack([t6, t5, t7, t4], axis=1)  # (3, 4, n)
        tot = gl.add(
            gl.add(GF(z.lo[0], z.hi[0]), GF(z.lo[1], z.hi[1])),
            GF(z.lo[2], z.hi[2]),
        )  # (4, n)
        out = gl.add(z, bcast(GF(tot.lo[None], tot.hi[None]), z.lo.shape))
        return gl.reshape(out, (WIDTH, n))

    def rc_gf(r) -> GF:
        g = gl.from_int_np(np.asarray(rc[r], dtype=np.uint64)[:, None])
        return GF(jnp.asarray(g.lo), jnp.asarray(g.hi))

    s = external(x)
    for r in range(N_ROUNDS):
        if _is_full_round(r):
            s = external(_sbox(gl.add(s, bcast(rc_gf(r), s.lo.shape))))
        else:
            c = rc[r][0]
            r0 = gl.add(
                GF(s.lo[0], s.hi[0]),
                GF(
                    jnp.full((n,), c & 0xFFFFFFFF, jnp.uint32),
                    jnp.full((n,), c >> 32, jnp.uint32),
                ),
            )
            r0 = _sbox(r0)
            s = GF(
                jnp.concatenate([r0.lo[None], s.lo[1:]], axis=0),
                jnp.concatenate([r0.hi[None], s.hi[1:]], axis=0),
            )
            tot = GF(s.lo[0], s.hi[0])
            for i in range(1, WIDTH):
                tot = gl.add(tot, GF(s.lo[i], s.hi[i]))
            mu = gl.from_int_np(
                np.asarray(internal_diag(), dtype=np.uint64)[:, None]
            )
            diag = gl.mul(
                s, bcast(GF(jnp.asarray(mu.lo), jnp.asarray(mu.hi)), s.lo.shape)
            )
            s = gl.add(bcast(GF(tot.lo[None], tot.hi[None]), s.lo.shape), diag)
    return s


def perm(state: GF, unroll: bool = False) -> GF:
    """Poseidon2 permutation; state shape (..., 12), vectorized over batch.

    Internally lane-major: the state becomes 12 row vectors over the
    flattened batch so every field op runs at full VPU lane width.  The
    full-round block and the internal-round block are each ONE lax.scan
    (constants scanned in), keeping the traced graph small.  Bit-identical
    to perm_host (tested).

    unroll=True swaps in the scan-free _perm_unrolled body (same math,
    ~2K unrolled HLO ops) — used by programs whose compile time on the
    remote-compile TPU backend is scan-bound (models/fri_layered.py)."""
    assert state.lo.shape[-1] == WIDTH
    batch = state.lo.shape[:-1]
    n = 1
    for d in batch:
        n *= d
    x = gl.transpose(gl.reshape(state, (max(n, 1), WIDTH)))  # (12, n)
    if unroll:
        st = _perm_unrolled(x)
        return gl.reshape(gl.transpose(st), batch + (WIDTH,))
    rc = round_constants()
    half = FULL_ROUNDS // 2

    rows = _external_rows(_rows_of(x))  # initial linear layer

    def full_body(st: GF, c):
        c_lo, c_hi = c
        rows = _rows_of(st)
        rows = [
            _sbox(gl.add(r, GF(jnp.broadcast_to(c_lo[i], r.lo.shape),
                               jnp.broadcast_to(c_hi[i], r.hi.shape))))
            for i, r in enumerate(rows)
        ]
        return _stack_rows(_external_rows(rows)), None

    def partial_body(st: GF, c):
        c_lo, c_hi = c
        rows = _rows_of(st)
        r0 = gl.add(rows[0], GF(jnp.broadcast_to(c_lo, rows[0].lo.shape),
                                jnp.broadcast_to(c_hi, rows[0].hi.shape)))
        rows[0] = _sbox(r0)
        return _stack_rows(_internal_rows(rows)), None

    def rc_arr(rounds, lane0_only=False):
        if lane0_only:
            vals = np.array([rc[r][0] for r in rounds], dtype=np.uint64)
        else:
            vals = np.array([rc[r] for r in rounds], dtype=np.uint64)
        g = gl.from_int_np(vals)
        return jnp.asarray(g.lo), jnp.asarray(g.hi)

    st = _stack_rows(rows)
    st, _ = jax.lax.scan(full_body, st, rc_arr(range(half)))
    st, _ = jax.lax.scan(
        partial_body, st, rc_arr(range(half, half + PARTIAL_ROUNDS), True)
    )
    st, _ = jax.lax.scan(
        full_body, st, rc_arr(range(half + PARTIAL_ROUNDS, N_ROUNDS))
    )
    return gl.reshape(gl.transpose(st), batch + (WIDTH,))


def hash_elements(elements: GF, unroll: bool = False) -> GF:
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
        state = perm(state, unroll=unroll)
    return GF(state.lo[..., :DIGEST], state.hi[..., :DIGEST])


def hash_two(left: GF, right: GF, unroll: bool = False) -> GF:
    """Device 2-to-1 compression: (..., 4) x (..., 4) -> (..., 4)."""
    batch = left.lo.shape[:-1]
    zeros = gl.zeros(batch + (WIDTH - 2 * DIGEST,))
    state = GF(
        jnp.concatenate([left.lo, right.lo, zeros.lo], axis=-1),
        jnp.concatenate([left.hi, right.hi, zeros.hi], axis=-1),
    )
    out = perm(state, unroll=unroll)
    return GF(out.lo[..., :DIGEST], out.hi[..., :DIGEST])
