"""KZG polynomial commitments over BN254 — TPU-native design.

Fills the role of the reference's `c-kzg` dependency (Cargo.toml:73; the
reth CLI's --trusted-setup-file flag, src/commands/reth.rs:74-76): a
commit/open/verify layer for blob/constraint polynomials.  The reference
links a C library and ships an SRS file; here the whole pipeline is
device math on top of this repo's own primitives:

  * commit  = Pippenger MSM of the coefficient vector against the G1 SRS
              (ops/msm.py fast path: signed digits + fused unsafe adds)
  * open    = quotient q(x) = (p(x) - p(z)) / (x - z) computed WITHOUT the
              sequential synthetic-division recurrence: with
              S_i = Σ_{j≥i} c_j z^j (one suffix scan on device),
              q_i = S_{i+1} · z^{-(i+1)} — all wide VPU ops — then an MSM
              of q against the SRS.  p(z) = S_0 falls out for free.
  * verify  = host pairing check e(C - [y]G1, [1]G2) == e(π, [τ-z]G2)
              (ops/pairing.py; verification is host-side bigint math
              throughout this repo, matching the prover/verifier split)

SRS: `setup_insecure` derives [τ^i]G1 from a known τ for tests/benches —
on device via a 254-step double-and-add over the whole power vector (the
per-step adds are complete pallas adds).  Production deployments load a
real ceremony SRS via `Srs` directly, the analog of c-kzg's
trusted-setup file.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bn254, msm
from ..ops import pairing as pr
from ..ops.bigint import MontCtx
from ..ops.bn254 import (
    G1_GEN,
    G2_GEN_X,
    G2_GEN_Y,
    PointJ,
    h_ec_add,
    h_ec_mul,
)


@dataclass
class Srs:
    """[1, τ, τ², …]·G1 (device limb arrays) + [τ]·G2 (host affine)."""

    g1_x: jnp.ndarray  # (L, n) Montgomery x-coordinates
    g1_y: jnp.ndarray  # (L, n)
    g1_inf: jnp.ndarray  # (n,) bool
    g2_tau: tuple  # ((x0, x1), (y0, y1)) host ints

    @property
    def n(self) -> int:
        return self.g1_x.shape[1]

    def g1_points_host(self):
        """Affine host-int points (None = infinity) — test convenience."""
        F = bn254.FqOps()
        xs, ys = F.to_int(self.g1_x), F.to_int(self.g1_y)
        inf = np.asarray(self.g1_inf)
        return [
            None if inf[i] else (int(xs[i]), int(ys[i])) for i in range(self.n)
        ]


def _fr() -> MontCtx:
    return bn254.fr()


def _fr_powers(ctx: MontCtx, base: int, n: int) -> jnp.ndarray:
    """[1, b, …, b^{n-1}] in Montgomery form, built on device by block
    doubling: block [t, 2t) = block [0, t) · b^t — log2(n) wide mont_muls
    (the Fr analog of ops/goldilocks.powers)."""
    out = ctx.one_mont((1,))
    total = 1
    while total < n:
        step = min(total, n - total)
        factor = ctx.const_mont(pow(base, total, ctx.q), (step,))
        out = jnp.concatenate([out, ctx.mont_mul(out[:, :step], factor)], axis=-1)
        total += step
    return out


def setup_insecure(n: int, tau: int, device: bool = True) -> Srs:
    """Derive an SRS from a KNOWN τ — tests and benches only (a real
    deployment must load a ceremony SRS where τ was destroyed).

    Device path: τ powers via the Fr ladder, then one 254-step
    double-and-add sweep adding 2^j·G into every lane whose scalar has
    bit j — complete pallas adds at full width."""
    g2_tau = h_ec_mul(tau, (G2_GEN_X, G2_GEN_Y), bn254.HOST_FQ2)
    if not device or n <= 64:
        pts = [h_ec_mul(pow(tau, i, bn254.R), G1_GEN) for i in range(n)]
        F = bn254.FqOps()
        xs = F.ctx.from_int([p[0] if p else 0 for p in pts])
        ys = F.ctx.from_int([p[1] if p else 0 for p in pts])
        inf = jnp.asarray(np.array([p is None for p in pts]))
        return Srs(xs, ys, inf, g2_tau)

    frc = _fr()
    F = bn254.FqOps()
    G = msm.ECGroup(F)
    taus = frc.from_mont(_fr_powers(frc, tau, n))  # (L, n) canonical limbs

    # host table of 2^j · G
    dbl = [G1_GEN]
    for _ in range(253):
        dbl.append(h_ec_add(dbl[-1], dbl[-1]))
    tx = F.ctx.from_int([p[0] for p in dbl])  # (L, 254)
    ty = F.ctx.from_int([p[1] for p in dbl])

    @jax.jit
    def sweep(taus, tx, ty):
        zeros = jnp.zeros((frc.L, n), jnp.uint32)
        one = F.one_like(zeros)

        def body(j, acc):
            limb = j // 16
            bit = (taus[limb] >> (j % 16).astype(jnp.uint32)) & 1
            px = jnp.broadcast_to(tx[:, j][:, None], (frc.L, n))
            py = jnp.broadcast_to(ty[:, j][:, None], (frc.L, n))
            added = G.add(acc, PointJ(px, py, one))
            return msm._point_select(F, bit.astype(bool), added, acc)

        acc = jax.lax.fori_loop(
            0, 254, body, PointJ(zeros, zeros, zeros)
        )
        ax, ay = bn254.to_affine(F, acc)
        return ax, ay, F.is_zero(acc.z)

    xs, ys, inf = sweep(taus, tx, ty)
    return Srs(xs, ys, inf, g2_tau)


def commit(srs: Srs, coeffs: Sequence[int], eager: bool = False):
    """C = Σ c_i·[τ^i]G1 — one fast MSM.  Returns affine host ints."""
    n = len(coeffs)
    assert n <= srs.n, "polynomial degree exceeds SRS size"
    return msm.msm_g1_device(
        srs.g1_x[:, :n], srs.g1_y[:, :n], srs.g1_inf[:n], list(coeffs),
        eager=eager,
    )


@jax.jit
def _quotient_jit(c_mont, zpow, zinv_pow):
    """q_i = (Σ_{j≥i+1} c_j z^j) · z^{-(i+1)}; also returns p(z).

    One mont_mul + a log-depth suffix scan + one mont_mul — no
    sequential division recurrence."""
    frc = _fr()
    t = frc.mont_mul(c_mont, zpow)  # c_j z^j
    suffix = jax.lax.associative_scan(frc.add, t, axis=1, reverse=True)
    p_z = suffix[:, 0]
    s_next = jnp.concatenate(
        [suffix[:, 1:], frc.zeros((1,))], axis=1
    )  # S_{i+1}
    q = frc.mont_mul(s_next, zinv_pow)  # · z^{-(i+1)}
    return q, p_z


def open_at(srs: Srs, coeffs: Sequence[int], z: int, eager: bool = False):
    """KZG opening of p at z: returns (proof_point, y = p(z))."""
    frc = _fr()
    n = len(coeffs)
    z = z % bn254.R
    if z == 0:
        y = coeffs[0] % bn254.R
        q = [int(c) % bn254.R for c in coeffs[1:]]
    else:
        c_mont = frc.from_int(list(coeffs))
        zpow = _fr_powers(frc, z, n)
        zinv = pow(z, bn254.R - 2, bn254.R)
        # z^{-(i+1)} = z^{-1} · (z^{-1})^i
        zinv_pow = frc.mont_mul(
            _fr_powers(frc, zinv, n), frc.const_mont(zinv, (n,))
        )
        q_m, y_m = _quotient_jit(c_mont, zpow, zinv_pow)
        y = int(frc.to_int(y_m))
        q = [int(v) for v in frc.to_int(q_m[:, : n - 1])]
    proof = msm.msm_g1_device(
        srs.g1_x[:, : max(len(q), 1)],
        srs.g1_y[:, : max(len(q), 1)],
        srs.g1_inf[: max(len(q), 1)],
        q if q else [0],
        eager=eager,
    )
    return proof, y


def verify(srs: Srs, commitment, z: int, y: int, proof) -> bool:
    """Host pairing check: e(C - [y]G1, [1]G2) == e(π, [τ-z]G2)."""
    z, y = z % bn254.R, y % bn254.R
    g2_gen = (G2_GEN_X, G2_GEN_Y)
    c_minus_y = h_ec_add(
        commitment, h_ec_mul((bn254.R - y) % bn254.R, G1_GEN)
    )
    tau_minus_z = h_ec_add(
        srs.g2_tau,
        h_ec_mul((bn254.R - z) % bn254.R, g2_gen, bn254.HOST_FQ2),
        bn254.HOST_FQ2,
    )
    if proof is None:
        # zero quotient: valid iff C == [y]G1
        return c_minus_y is None
    if c_minus_y is None:
        c_minus_y = None  # pairing(inf, ·) = 1; handled below
    lhs = _pairing_or_one(c_minus_y, g2_gen)
    rhs = _pairing_or_one(proof, tau_minus_z)
    return lhs == rhs


def _pairing_or_one(p, q2):
    if p is None or q2 is None:
        return pr.F12_ONE
    return pr.pairing(p, q2)
