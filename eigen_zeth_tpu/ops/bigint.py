"""Generic multi-precision modular arithmetic in 16-bit limbs (uint32 lanes).

The MSM/Groth16 layer needs 254-bit BN254 arithmetic; TPUs have neither
64-bit integers nor a wide multiplier, so elements live as L=16 limbs of
16 bits, each limb stored in its own uint32 plane (limb-major: an array of
N field elements is a (16, N) uint32 array → every limb plane maps densely
onto VPU lanes).

Why radix 2^16 with a 32-bit accumulator: the CIOS Montgomery inner step
computes  t + a_i·b_j + carry  with t, carry < 2^16 and
a_i·b_j ≤ (2^16-1)^2, whose sum is exactly ≤ 2^32 - 1 — the classic
"word product plus two words fits the double word" identity.  So the whole
CIOS loop runs in uint32 with zero overflow headroom tricks.

All loops are unrolled at trace time (L is a compile-time constant); there
is no data-dependent control flow, so everything jits and shards cleanly.

Replaces (TPU-native redesign): the 256-bit CPU/GPU arithmetic inside the
reference's external eigen-prover (SURVEY.md §2.9-bis); the reference repo
itself only ever parses the resulting proof integers as decimal strings
(src/settlement/ethereum/mod.rs:445-481).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16


@functools.lru_cache(maxsize=1)
def _pallas_enabled() -> bool:
    """Pallas kernels run on real TPU backends; CPU tests use XLA (or set
    EZT_MONT_BACKEND=pallas / xla to force either)."""
    forced = os.environ.get("EZT_MONT_BACKEND", "")
    if forced == "pallas":
        return True
    if forced == "xla":
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False
MASK = jnp.uint32(0xFFFF)


def limbs_from_int(value: int, n_limbs: int) -> np.ndarray:
    out = np.zeros(n_limbs, dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = (value >> (LIMB_BITS * i)) & 0xFFFF
    return out


def int_from_limbs(limbs) -> int:
    v = 0
    for i, limb in enumerate(np.asarray(limbs, dtype=np.uint64)):
        v |= int(limb) << (LIMB_BITS * i)
    return v


class MontCtx:
    """Precomputed Montgomery context for an odd modulus (host-side setup).

    Device elements are (L, ...) uint32 arrays in Montgomery form
    (a·R mod q, R = 2^(16·L))."""

    def __init__(self, modulus: int, n_limbs: int = 16):
        assert modulus % 2 == 1
        self.q = modulus
        self.L = n_limbs
        self.R = 1 << (LIMB_BITS * n_limbs)
        assert modulus < self.R
        self.R_mod = self.R % modulus
        self.R2_mod = (self.R * self.R) % modulus
        # full-width N' = -q^{-1} mod R (REDC uses m = T_lo * N' mod R)
        self.nprime = (-pow(modulus, -1, self.R)) % self.R
        # numpy constants: MontCtx is lru-cached and may first be built
        # inside a jit trace; jnp arrays cached there would leak tracers
        self.q_limbs_np = limbs_from_int(modulus, n_limbs)
        self.q_limbs = self.q_limbs_np
        self.nprime_limbs = limbs_from_int(self.nprime, n_limbs)
        # Antidiagonal-binning one-hot matrices for the matmul bigmul:
        # row k sums limb products with i+j == k (lo parts) / i+j+1 == k (hi).
        L = n_limbs
        mlo = np.zeros((2 * L, L * L), dtype=np.float32)
        mhi = np.zeros((2 * L, L * L), dtype=np.float32)
        for i in range(L):
            for j in range(L):
                mlo[i + j, i * L + j] = 1.0
                mhi[i + j + 1, i * L + j] = 1.0
        self._mlo = mlo
        self._mhi = mhi
        self._mlo_half = mlo[:L]
        self._mhi_half = mhi[:L]

    # -- host <-> device ----------------------------------------------------

    def from_int(self, values, mont: bool = True) -> jnp.ndarray:
        """Python ints / iterable -> (L, ...) device array (Montgomery form).

        Limb decomposition via a single bytes round trip (no per-limb
        python loop — that costs seconds at MSM sizes)."""
        arr = np.asarray(values, dtype=object)
        flat = arr.reshape(-1)
        q, r_mod = self.q, self.R_mod
        if mont:
            ints = [int(v) % q * r_mod % q for v in flat]
        else:
            ints = [int(v) % q for v in flat]
        nbytes = self.L * 2
        buf = b"".join(v.to_bytes(nbytes, "little") for v in ints)
        out = (
            np.frombuffer(buf, dtype="<u2")
            .reshape(len(ints), self.L)
            .T.astype(np.uint32)
        )
        return jnp.asarray(out.reshape((self.L,) + arr.shape))

    def to_int(self, x: jnp.ndarray, mont: bool = True) -> np.ndarray:
        """(L, ...) device array -> object ndarray of python ints."""
        host = np.asarray(jax.device_get(x), dtype=np.uint32)
        flat = host.reshape(self.L, -1).T.astype("<u2")  # limbs are 16-bit
        buf = flat.tobytes()
        nbytes = self.L * 2
        r_inv = pow(self.R_mod, self.q - 2, self.q) if mont else 1
        out = np.empty(flat.shape[0], dtype=object)
        for i in range(flat.shape[0]):
            v = int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little")
            out[i] = (v * r_inv) % self.q if mont else v
        return out.reshape(host.shape[1:])

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros((self.L,) + tuple(shape), dtype=jnp.uint32)

    def one_mont(self, shape=()) -> jnp.ndarray:
        """Montgomery representation of 1 (= R mod q), broadcast to shape."""
        base = limbs_from_int(self.R_mod, self.L).reshape((self.L,) + (1,) * len(tuple(shape)))
        return jnp.broadcast_to(jnp.asarray(base), (self.L,) + tuple(shape)).copy()

    def const_mont(self, value: int, shape=()) -> jnp.ndarray:
        v = (int(value) % self.q) * self.R_mod % self.q
        base = limbs_from_int(v, self.L).reshape((self.L,) + (1,) * len(tuple(shape)))
        return jnp.broadcast_to(jnp.asarray(base), (self.L,) + tuple(shape)).copy()

    # -- core modular ops (all shapes (L, ...)) -----------------------------

    def _geq(self, a, b) -> jnp.ndarray:
        """a >= b, limbwise lexicographic from the top limb."""
        gt = jnp.zeros(a.shape[1:], dtype=bool)
        eq = jnp.ones(a.shape[1:], dtype=bool)
        for i in range(self.L - 1, -1, -1):
            gt = gt | (eq & (a[i] > b[i]))
            eq = eq & (a[i] == b[i])
        return gt | eq

    def _sub_raw(self, a, b):
        """a - b assuming a >= b (limbwise with borrow chain)."""
        out = []
        borrow = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
        for i in range(self.L):
            d = a[i] - b[i] - borrow
            borrow = (d >> 31) & 1  # negative in int32 terms => wrapped
            out.append(d & MASK)
        return jnp.stack(out)

    def _add_raw(self, a, b):
        """a + b with carry chain; result may exceed q but fits L limbs + carry."""
        out = []
        carry = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
        for i in range(self.L):
            s = a[i] + b[i] + carry
            out.append(s & MASK)
            carry = s >> 16
        return jnp.stack(out), carry

    def _cond_sub_q(self, t, extra):
        """t (L limbs) + extra·2^(16L) minus q when >= q."""
        qb = jnp.broadcast_to(
            self.q_limbs.reshape((self.L,) + (1,) * (t.ndim - 1)), t.shape
        )
        ge = self._geq(t, qb) | (extra > 0)
        sub = self._sub_raw_mod_carry(t, qb, extra)
        return jnp.where(ge, sub, t)

    def _sub_raw_mod_carry(self, a, b, extra):
        """(a + extra·2^(16L)) - b  mod 2^(16L) (borrow absorbed by extra)."""
        out = []
        borrow = jnp.zeros(a.shape[1:], dtype=jnp.uint32)
        for i in range(self.L):
            d = a[i] - b[i] - borrow
            borrow = (d >> 31) & 1
            out.append(d & MASK)
        return jnp.stack(out)

    def add(self, a, b):
        s, carry = self._add_raw(a, b)
        return self._cond_sub_q(s, carry)

    def sub(self, a, b):
        qb = jnp.broadcast_to(
            self.q_limbs.reshape((self.L,) + (1,) * (a.ndim - 1)), a.shape
        )
        lt = ~self._geq(a, b)
        # a - b, or a + q - b where a < b
        apq, carry = self._add_raw(a, qb)
        diff_direct = self._sub_raw(a, b)
        diff_wrap = self._sub_raw_mod_carry(apq, b, carry)
        return jnp.where(lt, diff_wrap, diff_direct)

    def neg(self, a):
        qb = jnp.broadcast_to(
            self.q_limbs.reshape((self.L,) + (1,) * (a.ndim - 1)), a.shape
        )
        is_zero = self.is_zero(a)
        r = self._sub_raw(qb, a)
        return jnp.where(is_zero, a, r)

    def is_zero(self, a) -> jnp.ndarray:
        z = a[0] == 0
        for i in range(1, self.L):
            z = z & (a[i] == 0)
        return z

    def eq(self, a, b) -> jnp.ndarray:
        e = a[0] == b[0]
        for i in range(1, self.L):
            e = e & (a[i] == b[i])
        return e

    def _bigmul(self, a, b, half: bool = False):
        """Full (or mod-R) product of L-limb values via antidiagonal matmul.

        The 256 16-bit limb products are one broadcast uint32 multiply; the
        Σ_{i+j=k} bin sums become two one-hot matmuls in f32 (operands
        < 2^16, ≤ L terms per bin → sums < 2^21: exactly representable),
        followed by a single carry-propagation sweep.  This keeps the jit
        trace ~50 ops and puts the reduction on the MXU."""
        L = self.L
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        # left-pad batch dims so ranks match before broadcasting
        a2 = a.reshape((L,) + (1,) * (len(shape) - (a.ndim - 1)) + a.shape[1:])
        b2 = b.reshape((L,) + (1,) * (len(shape) - (b.ndim - 1)) + b.shape[1:])
        prod = (a2[:, None] * b2[None, :]).reshape(
            (L * L, -1) if shape else (L * L, 1)
        )
        lo = (prod & MASK).astype(jnp.float32)
        hi = (prod >> 16).astype(jnp.float32)
        mlo = self._mlo_half if half else self._mlo
        mhi = self._mhi_half if half else self._mhi
        # HIGHEST precision: the 0/1 matrix side is bf16-exact, so the TPU
        # 3-pass f32 emulation is exact for our < 2^21 integer sums
        # (default single-pass bf16 is NOT and corrupts limbs).
        s = (
            jnp.tensordot(mlo, lo, axes=([1], [0]), precision=jax.lax.Precision.HIGHEST)
            + jnp.tensordot(mhi, hi, axes=([1], [0]), precision=jax.lax.Precision.HIGHEST)
        ).astype(jnp.uint32)
        s = s.reshape((s.shape[0],) + (shape if shape else ()))
        # single carry sweep: bin sums < 2^21, carries < 2^6
        out = []
        c = jnp.zeros(shape, dtype=jnp.uint32)
        nlimbs = L if half else 2 * L
        for k in range(nlimbs):
            v = s[k] + c
            out.append(v & MASK)
            c = v >> 16
        return jnp.stack(out)  # final carry is 0 for full, dropped for half

    def mont_mul(self, a, b):
        """Montgomery multiply a·b·R^{-1} mod q.

        Dispatch: on TPU (any non-CPU backend) with a real batch, the
        Pallas CIOS kernel (ops/pallas/mont_pl.py) runs the whole multiply
        in VMEM — ~100x the XLA path, which must materialize (L, L, B)
        limb products in HBM.  CPU and scalar shapes use the XLA path."""
        if _pallas_enabled() and (a.ndim > 1 or b.ndim > 1):
            from .pallas.mont_pl import mont_mul_pallas

            shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
            size = 1
            for d in shape:
                size *= d
            if size >= 128:
                a2 = jnp.broadcast_to(
                    a.reshape((self.L,) + (1,) * (len(shape) - (a.ndim - 1)) + a.shape[1:]),
                    (self.L,) + shape,
                ).reshape(self.L, -1)
                b2 = jnp.broadcast_to(
                    b.reshape((self.L,) + (1,) * (len(shape) - (b.ndim - 1)) + b.shape[1:]),
                    (self.L,) + shape,
                ).reshape(self.L, -1)
                out = mont_mul_pallas(self, a2, b2)
                return out.reshape((self.L,) + shape)
        return self._mont_mul_xla(a, b)

    def _mont_mul_xla(self, a, b):
        """XLA-graph Montgomery multiply via full-width REDC:

          T = a·b;  m = T_lo·N' mod R;  t = (T + m·q) / R;  t -= q if t >= q

        The low halves of T and m·q sum to 0 or exactly R, so only the high
        halves are added, with carry-in 1 iff T_lo != 0."""
        L = self.L
        T = self._bigmul(a, b)  # (2L, ...)
        t_lo = T[:L]
        m = self._bigmul(t_lo, self._bcast_const(self.nprime_limbs, t_lo), half=True)
        mq = self._bigmul(m, self._bcast_const(self.q_limbs, m))  # (2L, ...)
        carry_low = (~self.is_zero(t_lo)).astype(jnp.uint32)
        out = []
        c = carry_low
        for k in range(L):
            v = T[L + k] + mq[L + k] + c
            out.append(v & MASK)
            c = v >> 16
        return self._cond_sub_q(jnp.stack(out), c)

    def _bcast_const(self, limbs, like):
        return jnp.broadcast_to(
            limbs.reshape((self.L,) + (1,) * (like.ndim - 1)), like.shape
        )

    def mont_sq(self, a):
        return self.mont_mul(a, a)

    def to_mont(self, a):
        r2 = jnp.broadcast_to(
            jnp.asarray(limbs_from_int(self.R2_mod, self.L)).reshape(
                (self.L,) + (1,) * (a.ndim - 1)
            ),
            a.shape,
        )
        return self.mont_mul(a, r2)

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[0].set(1)
        return self.mont_mul(a, one)

    def mont_pow(self, a, exponent: int):
        """a^e (Montgomery in/out) for a host-known exponent.

        Uses lax.fori_loop over the exponent bits (LSB first) to keep the
        trace small: the body contains two mont_muls, not e·mont_muls."""
        nbits = max(exponent.bit_length(), 1)
        bits = jnp.asarray(
            [(exponent >> i) & 1 for i in range(nbits)], dtype=jnp.uint32
        )
        one = self.one_mont(a.shape[1:])

        def body(i, carry):
            result, base = carry
            bit = bits[i]
            mul = self.mont_mul(result, base)
            result = jnp.where(bit.astype(bool), mul, result)
            base = self.mont_sq(base)
            return result, base

        result, _ = jax.lax.fori_loop(0, nbits, body, (one, a))
        return result

    def inv(self, a):
        """a^{-1} (Montgomery in/out) via Fermat; inv(0) = 0."""
        return self.mont_pow(a, self.q - 2)

    def select(self, pred, a, b):
        """pred ? a : b with pred shaped like the element batch."""
        return jnp.where(pred, a, b)


@functools.lru_cache(maxsize=8)
def mont_ctx(modulus: int, n_limbs: int = 16) -> MontCtx:
    return MontCtx(modulus, n_limbs)
