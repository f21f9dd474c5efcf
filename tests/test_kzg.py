"""KZG commit/open/verify over BN254 (models/kzg.py).

Fills the c-kzg role from the reference (Cargo.toml:73; the reth CLI's
--trusted-setup-file flag, src/commands/reth.rs:74-76).  Oracle: direct
host-bigint evaluation + the pairing identity.

Eager EC on the hermetic CPU backend costs ~1 min per MSM, so the suite
computes ONE commit and ONE opening in a module fixture and drives every
verify-side assertion (roundtrip + all tamper cases) off that pair —
same strategy the reference uses with its fixed proof test vectors.
"""

import numpy as np
import pytest

from eigen_zeth_tpu.models import kzg
from eigen_zeth_tpu.ops import bn254
from eigen_zeth_tpu.ops.bn254 import G1_GEN, h_ec_add, h_ec_mul

R = bn254.R
RNG = np.random.default_rng(20260817)


def _rand_fr(n):
    return [int.from_bytes(RNG.bytes(32), "little") % R for _ in range(n)]


def _eval_host(coeffs, z):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % R
    return acc


@pytest.fixture(scope="module")
def ctx():
    """One SRS + one commit + one opening, shared by every test below."""
    srs = kzg.setup_insecure(16, tau=0x5EED5EED, device=False)
    coeffs = _rand_fr(8)
    z = _rand_fr(1)[0]
    C = kzg.commit(srs, coeffs, eager=True)
    proof, y = kzg.open_at(srs, coeffs, z, eager=True)
    return srs, coeffs, z, C, proof, y


def test_commit_matches_naive(ctx):
    srs, coeffs, _, C, _, _ = ctx
    pts = srs.g1_points_host()
    want = None
    for c, p in zip(coeffs, pts):
        want = h_ec_add(want, h_ec_mul(c, p))
    assert C == want


def test_open_value_matches_horner(ctx):
    _, coeffs, z, _, _, y = ctx
    assert y == _eval_host(coeffs, z)


def test_verify_roundtrip(ctx):
    srs, _, z, C, proof, y = ctx
    assert kzg.verify(srs, C, z, y, proof)


def test_verify_rejects_wrong_value(ctx):
    srs, _, z, C, proof, y = ctx
    assert not kzg.verify(srs, C, z, (y + 1) % R, proof)


def test_verify_rejects_tampered_commitment(ctx):
    srs, _, z, C, proof, y = ctx
    assert not kzg.verify(srs, h_ec_add(C, G1_GEN), z, y, proof)


def test_verify_rejects_tampered_proof(ctx):
    srs, _, z, C, proof, y = ctx
    assert not kzg.verify(srs, C, z, y, h_ec_add(proof, G1_GEN))


def test_verify_rejects_wrong_point(ctx):
    srs, _, z, C, proof, y = ctx
    assert not kzg.verify(srs, C, (z + 1) % R, y, proof)


def test_setup_device_matches_host():
    """The 254-step device double-and-add SRS sweep == host scalar muls."""
    tau = 0x1234ABCD
    host = kzg.setup_insecure(80, tau, device=False)
    dev = kzg.setup_insecure(80, tau, device=True)
    assert host.g1_points_host() == dev.g1_points_host()
    assert host.g2_tau == dev.g2_tau


def test_open_at_zero_host_oracle(ctx):
    """z=0 short-circuit: q = coeffs[1:], y = c_0 — checked against a
    host-MSM proof so no second device MSM is needed."""
    srs, coeffs, _, C, _, _ = ctx
    y = coeffs[0] % R
    pts = srs.g1_points_host()
    want_proof = None
    for c, p in zip(coeffs[1:], pts):
        want_proof = h_ec_add(want_proof, h_ec_mul(c, p))
    assert kzg.verify(srs, C, 0, y, want_proof)
    assert not kzg.verify(srs, C, 0, (y + 1) % R, want_proof)
