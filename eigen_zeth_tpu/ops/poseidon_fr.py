"""Poseidon2 permutation over BN254 Fr — the SNARK-friendly outer hash.

Role: the final-wrap layer (models/air_wrap.py) re-commits the aggregation
attestation STARK with Merkle trees and a Fiat-Shamir transcript over Fr so
that the Groth16 wrap circuit can verify the whole STARK *in-circuit*
(VERDICT r2 item 5): one Poseidon2-Fr permutation costs ~492 R1CS
constraints (S-box multiplies only — the linear layers fold into R1CS
linear combinations for free), where a Goldilocks-Poseidon permutation
would cost ~62K (every GL multiply needs a mod-p reduction witness with a
64-bit range decomposition).  The reference's equivalent seam is the
fflonk/Groth16 wrap its external prover applies before settlement
(/root/reference/proto/prover/v1/prover.proto:130-148: FinalProof carries
only the wrapped proof + one public input).

Parameters (this framework pins its own instance, like the Goldilocks one
in ops/poseidon.py — the reference publishes none):
  * width t = 12 over Fr (BN254 scalar field, 254 bits),
    RATE 11, CAPACITY 1 (one 254-bit capacity lane ≈ 127-bit collision
    resistance — the standard Poseidon-BN254 capacity choice),
  * S-box x^5 (gcd(5, r-1) = 1), R_F = 8 (4+4), R_P = 68
    (the Poseidon v1/v2 tables give R_P = 56-60 for α=5 at ~2^254 and
    t ≤ 12; 68 keeps a ~15% margin — each extra partial round costs only
    3 R1CS constraints),
  * external matrix circ(2·M4, M4, M4) and internal allones+diag(mu_i),
    exactly the Poseidon2 shape of the Goldilocks instance,
  * constants: SHA-256("ezt-poseidon2-fr12/...") mod r — nothing up my
    sleeve, internal-round constants on lane 0 only.

Three implementations, kept bit-identical by tests:
  * host scalar (python ints) — transcript + Merkle path verification;
  * device (ops/bigint.py MontCtx, 16x16-bit limb planes): lax.scan over
    rounds so the XLA graph is two small round bodies, vectorized over N
    lanes — bulk Merkle tree construction;
  * R1CS gadget (models/r1cs_builder.py) — the in-circuit verifier.

Packing: Goldilocks values ride 3-per-Fr-element (3x64 = 192 < 254 bits).
The circuit unpacks with the same 64-bit range decompositions it already
needs for lazy GL arithmetic, and leaf hashing gets 3x cheaper everywhere.
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from . import bn254
from .bigint import MontCtx

R = bn254.R  # BN254 Fr modulus

WIDTH = 12
RATE = 11
CAPACITY = 1
FULL_ROUNDS = 8
PARTIAL_ROUNDS = 68
N_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS
ALPHA = 5

M4 = (
    (5, 7, 1, 3),
    (4, 6, 1, 1),
    (1, 3, 5, 7),
    (1, 1, 4, 6),
)

GL_PACK = 3  # Goldilocks values per Fr element


def _sha_to_fr(tag: str) -> int:
    h = hashlib.sha256(tag.encode()).digest()
    return int.from_bytes(h, "big") % R


def _is_full_round(r: int) -> bool:
    half = FULL_ROUNDS // 2
    return r < half or r >= half + PARTIAL_ROUNDS


@functools.lru_cache(maxsize=1)
def round_constants() -> list[list[int]]:
    out = []
    for r in range(N_ROUNDS):
        if _is_full_round(r):
            out.append(
                [_sha_to_fr(f"ezt-poseidon2-fr12/rc/{r}/{i}") for i in range(WIDTH)]
            )
        else:
            out.append([_sha_to_fr(f"ezt-poseidon2-fr12/rc/{r}/0")] + [0] * (WIDTH - 1))
    return out


@functools.lru_cache(maxsize=1)
def internal_diag() -> list[int]:
    """mu_i for M_I = allones + diag(mu); resample on 0/-1 (none occur)."""
    out = []
    for i in range(WIDTH):
        v = _sha_to_fr(f"ezt-poseidon2-fr12/diag/{i}")
        k = 0
        while v in (0, R - 1):  # pragma: no cover - never hit for this tag set
            k += 1
            v = _sha_to_fr(f"ezt-poseidon2-fr12/diag/{i}/{k}")
        out.append(v)
    return out


# ---------------------------------------------------------------------------
# host scalar implementation (python ints)


def _sbox_host(x: int) -> int:
    x2 = x * x % R
    x4 = x2 * x2 % R
    return x4 * x % R


def _m4_block_host(x: list[int]) -> list[int]:
    t0 = (x[0] + x[1]) % R
    t1 = (x[2] + x[3]) % R
    t2 = (2 * x[1] + t1) % R
    t3 = (2 * x[3] + t0) % R
    t4 = (4 * t1 + t3) % R
    t5 = (4 * t0 + t2) % R
    t6 = (t3 + t5) % R
    t7 = (t2 + t4) % R
    return [t6, t5, t7, t4]


def _external_host(s: list[int]) -> list[int]:
    blocks = [_m4_block_host(s[i : i + 4]) for i in range(0, WIDTH, 4)]
    sums = [sum(b[j] for b in blocks) % R for j in range(4)]
    return [(blocks[i // 4][i % 4] + sums[i % 4]) % R for i in range(WIDTH)]


def _internal_host(s: list[int]) -> list[int]:
    mu = internal_diag()
    tot = sum(s) % R
    return [(tot + mu[i] * s[i]) % R for i in range(WIDTH)]


def perm_host(state: list[int]) -> list[int]:
    assert len(state) == WIDTH
    s = [v % R for v in state]
    rc = round_constants()
    s = _external_host(s)  # initial linear layer
    for r in range(N_ROUNDS):
        if _is_full_round(r):
            s = [(v + c) % R for v, c in zip(s, rc[r])]
            s = [_sbox_host(v) for v in s]
            s = _external_host(s)
        else:
            s = [(s[0] + rc[r][0]) % R] + s[1:]
            s = [_sbox_host(s[0])] + s[1:]
            s = _internal_host(s)
    return s


def hash_elements_host(elements: list[int], tag: str = "leaf") -> int:
    """Sponge over RATE lanes; capacity lane seeded with a domain tag +
    the input length.  Digest = one Fr element (state[0])."""
    s = [0] * WIDTH
    s[WIDTH - 1] = (_sha_to_fr("ezt-pfr-sponge/" + tag) + len(elements)) % R
    for i in range(0, len(elements), RATE):
        blk = elements[i : i + RATE]
        for j, v in enumerate(blk):
            s[j] = (s[j] + v % R) % R
        s = perm_host(s)
    return s[0]


def hash_two_host(left: int, right: int) -> int:
    """2-to-1 Merkle compression: one permutation."""
    s = [0] * WIDTH
    s[0] = left % R
    s[1] = right % R
    s[WIDTH - 1] = _sha_to_fr("ezt-pfr-sponge/node")
    return perm_host(s)[0]


def pack_gl_host(values: list[int]) -> list[int]:
    """Pack canonical Goldilocks values 3-per-Fr (64 bits each)."""
    out = []
    for i in range(0, len(values), GL_PACK):
        blk = values[i : i + GL_PACK]
        v = 0
        for j, x in enumerate(blk):
            assert 0 <= int(x) < (1 << 64)
            v |= int(x) << (64 * j)
        out.append(v)
    return out


# ---------------------------------------------------------------------------
# device implementation (MontCtx limb planes, lax.scan over rounds)


@functools.lru_cache(maxsize=1)
def _ctx() -> MontCtx:
    return bn254.fr()


@functools.lru_cache(maxsize=1)
def _device_consts():
    """Montgomery-form constants: (rc_full (8, W, L), rc_part (RP, L),
    mu (W, L)) as numpy uint32 (limb axis LAST here; moved in the scan)."""
    ctx = _ctx()
    rc = round_constants()
    full_rs = [r for r in range(N_ROUNDS) if _is_full_round(r)]
    part_rs = [r for r in range(N_ROUNDS) if not _is_full_round(r)]

    def mont_limbs(v: int) -> np.ndarray:
        from .bigint import limbs_from_int

        return limbs_from_int(v * ctx.R_mod % R, ctx.L)

    rc_full = np.stack(
        [np.stack([mont_limbs(rc[r][i]) for i in range(WIDTH)]) for r in full_rs]
    )  # (8, W, L)
    rc_part = np.stack([mont_limbs(rc[r][0]) for r in part_rs])  # (RP, L)
    mu = np.stack([mont_limbs(m) for m in internal_diag()])  # (W, L)
    return rc_full, rc_part, mu


def _sbox_dev(ctx: MontCtx, x):
    x2 = ctx.mont_sq(x)
    x4 = ctx.mont_sq(x2)
    return ctx.mont_mul(x4, x)


def _m4_block_dev(ctx: MontCtx, x: list):
    add = ctx.add
    t0 = add(x[0], x[1])
    t1 = add(x[2], x[3])
    t2 = add(add(x[1], x[1]), t1)
    t3 = add(add(x[3], x[3]), t0)
    t4 = add(add(add(t1, t1), add(t1, t1)), t3)
    t5 = add(add(add(t0, t0), add(t0, t0)), t2)
    t6 = add(t3, t5)
    t7 = add(t2, t4)
    return [t6, t5, t7, t4]


def _external_dev(ctx: MontCtx, lanes: list):
    blocks = [_m4_block_dev(ctx, lanes[i : i + 4]) for i in range(0, WIDTH, 4)]
    sums = [
        ctx.add(ctx.add(blocks[0][j], blocks[1][j]), blocks[2][j]) for j in range(4)
    ]
    return [ctx.add(blocks[i // 4][i % 4], sums[i % 4]) for i in range(WIDTH)]


def _internal_dev(ctx: MontCtx, lanes: list, mu_m):
    tot = lanes[0]
    for i in range(1, WIDTH):
        tot = ctx.add(tot, lanes[i])
    return [
        ctx.add(tot, ctx.mont_mul(mu_m[:, i], lanes[i])) for i in range(WIDTH)
    ]


def _lanes_of(state):
    return [state[:, i] for i in range(WIDTH)]


def _stack_lanes(lanes):
    return jnp.stack(lanes, axis=1)


@jax.jit
def _perm_device_run(state):
    """state: (L, W, N) Montgomery limb planes -> same, permuted.

    Both round flavors ride lax.scan bodies (one full-round body = 36
    Montgomery multiplies, one partial body = 15), so the XLA graph stays
    ~50 multiplies of trace — unrolling the 8 full rounds put ~300
    multiplies in the module and XLA CPU took >15 min to compile it."""
    ctx = _ctx()
    rc_full_np, rc_part_np, mu_np = _device_consts()
    rc_full = jnp.asarray(np.moveaxis(rc_full_np, -1, 1))  # (8, L, W)
    rc_part = jnp.asarray(np.moveaxis(rc_part_np, -1, 1))  # (RP, L)
    mu_m = jnp.asarray(mu_np.T)  # (L, W)

    half = FULL_ROUNDS // 2
    lanes = _lanes_of(state)
    lanes = _external_dev(ctx, lanes)

    def full_body(st, rc):
        lanes = _lanes_of(st)
        lanes = [ctx.add(lanes[i], rc[:, i][..., None]) for i in range(WIDTH)]
        lanes = [_sbox_dev(ctx, v) for v in lanes]
        return _stack_lanes(_external_dev(ctx, lanes)), None

    def part_body(st, rc):
        lanes = _lanes_of(st)
        l0 = ctx.add(lanes[0], rc[..., None])
        lanes = [_sbox_dev(ctx, l0)] + lanes[1:]
        return _stack_lanes(_internal_dev(ctx, lanes, mu_m)), None

    st, _ = jax.lax.scan(full_body, _stack_lanes(lanes), rc_full[:half])
    st, _ = jax.lax.scan(part_body, st, rc_part)
    st, _ = jax.lax.scan(full_body, st, rc_full[half:])
    return st


def perm_device(state):
    """(L, W, N) Montgomery-form state -> permuted (device)."""
    return _perm_device_run(state)


def pack_gl_device(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """(..., k) GL planes (lo/hi uint32) -> (L, ..., ceil(k/3)) NON-Montgomery
    Fr limb planes: value_j occupies limbs 4j..4j+3 (64 bits)."""
    k = lo.shape[-1]
    ctx = _ctx()
    n_fr = -(-k // GL_PACK)
    pad = n_fr * GL_PACK - k
    if pad:
        zeros = jnp.zeros(lo.shape[:-1] + (pad,), dtype=lo.dtype)
        lo = jnp.concatenate([lo, zeros], axis=-1)
        hi = jnp.concatenate([hi, zeros], axis=-1)
    lo = lo.reshape(lo.shape[:-1] + (n_fr, GL_PACK))
    hi = hi.reshape(hi.shape[:-1] + (n_fr, GL_PACK))
    limbs = []
    for j in range(GL_PACK):
        for plane in (lo[..., j], hi[..., j]):
            limbs.append((plane & 0xFFFF).astype(jnp.uint32))
            limbs.append((plane >> 16).astype(jnp.uint32))
    for _ in range(ctx.L - 4 * GL_PACK):
        limbs.append(jnp.zeros_like(limbs[0]))
    return jnp.stack(limbs)  # (L, ..., n_fr)


def to_mont(x: jnp.ndarray) -> jnp.ndarray:
    return _ctx().to_mont(x)
