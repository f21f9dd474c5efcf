"""Pippenger MSM vs host double-and-add reference (G1 and G2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eigen_zeth_tpu.ops import bn254, msm
from eigen_zeth_tpu.ops.bn254 import G1_GEN, G2_GEN_X, G2_GEN_Y, HOST_FQ2, h_ec_add, h_ec_mul

RNG = np.random.default_rng(0x35B)


def host_msm(points, scalars, F=None):
    acc = None
    for p, s in zip(points, scalars):
        term = h_ec_mul(int(s), p, F) if F else h_ec_mul(int(s), p)
        acc = h_ec_add(acc, term, F) if F else h_ec_add(acc, term)
    return acc


def rand_scalars(n, bits=254):
    return [int.from_bytes(RNG.bytes(40), "big") % bn254.R for _ in range(n)]


def test_scalar_digits_reconstruct():
    s = rand_scalars(8)
    d = msm.scalar_digits(s, c=8)
    for i, v in enumerate(s):
        got = sum(int(d[w, i]) << (8 * w) for w in range(d.shape[0]))
        assert got == v


def test_digits_from_limbs_matches_host():
    """Device digit extraction == host digit extraction at several window
    widths, including one (13) whose windows straddle limb boundaries."""
    s = rand_scalars(64)
    limbs = msm.scalar_limbs(s)
    for c in (4, 8, 13):
        host = msm.scalar_digits(s, c=c)
        dev = np.asarray(msm.digits_from_limbs(limbs, c=c))
        assert np.array_equal(host, dev), f"digit mismatch at c={c}"


def test_blocked_seg_scan_matches_numpy():
    """O(N) two-phase segmented scan (production TPU schedule) vs a
    per-segment numpy cumsum, IntGroup, random segment boundaries."""
    rng = np.random.default_rng(0xB10C)
    n = 512
    vals = rng.integers(0, 1 << 30, size=(2, 3, n)).astype(np.uint32)
    flags = rng.random((3, n)) < 0.1
    flags[:, 0] = True
    for serial in (8, 32, 128):
        got = np.asarray(
            msm._blocked_seg_scan(
                msm.IntGroup(), jnp.asarray(vals), jnp.asarray(flags), serial=serial
            )
        )
        want = vals.copy()
        for row in range(3):
            for i in range(1, n):
                if not flags[row, i]:
                    want[:, row, i] += want[:, row, i - 1]
        assert np.array_equal(got, want), f"seg scan mismatch at serial={serial}"


def test_msm_g1_serial_schedule():
    """The blocked-serial window sums (the on-chip production schedule)
    give the same MSM result as the Hillis-Steele schedule."""
    n = 64
    base_ks = [int(k) for k in RNG.integers(1, 1 << 30, size=n)]
    points = [h_ec_mul(k, G1_GEN) for k in base_ks]
    scalars = rand_scalars(n)
    c = 4
    F = bn254.FqOps()
    pts = msm._g1_device_points(points)
    digits = jnp.asarray(msm.scalar_digits(scalars, c=c))
    S = msm.msm_window_sums(
        msm.ECGroup(F), pts, digits, c=c, eager=True, serial=8
    )
    from eigen_zeth_tpu.ops.bn254 import to_affine

    ax, ay = to_affine(F, S)
    inf = np.asarray(F.is_zero(S.z))
    xs, ys = F.to_int(ax), F.to_int(ay)
    windows = [
        None if inf[w] else (int(xs[w]), int(ys[w])) for w in range(digits.shape[0])
    ]
    got = msm._host_horner(windows, c)
    expect = h_ec_mul(
        sum(k * s for k, s in zip(base_ks, scalars)) % bn254.R, G1_GEN
    )
    assert got == expect


def test_msm_g1_small():
    n = 32
    base_ks = [int(k) for k in RNG.integers(1, 1 << 30, size=n)]
    points = [h_ec_mul(k, G1_GEN) for k in base_ks]
    scalars = rand_scalars(n)
    got = msm.msm_g1(points, scalars, use_jit=False, c=4)
    expect = h_ec_mul(
        sum(k * s for k, s in zip(base_ks, scalars)) % bn254.R, G1_GEN
    )
    assert got == expect


@pytest.mark.slow
def test_msm_g1_edge_cases():
    g = G1_GEN
    p2 = h_ec_mul(2, g)
    # duplicate points, zero scalars, an infinity input
    points = [g, g, p2, None, g]
    scalars = [5, 5, 0, 123, bn254.R - 1]
    got = msm.msm_g1(points, scalars, use_jit=False, c=4)
    expect = h_ec_mul((5 + 5 + (bn254.R - 1)) % bn254.R, g)
    assert got == expect


@pytest.mark.slow
def test_msm_g1_zero_result():
    points = [G1_GEN, G1_GEN]
    scalars = [1, bn254.R - 1]
    assert msm.msm_g1(points, scalars, use_jit=False, c=4) is None


@pytest.mark.slow
def test_msm_g2_small():
    g2 = (G2_GEN_X, G2_GEN_Y)
    n = 8
    base_ks = [int(k) for k in RNG.integers(1, 1 << 20, size=n)]
    points = [h_ec_mul(k, g2, HOST_FQ2) for k in base_ks]
    scalars = rand_scalars(n)
    got = msm.msm_g2(points, scalars, use_jit=False, c=4)
    expect = h_ec_mul(
        sum(k * s for k, s in zip(base_ks, scalars)) % bn254.R, g2, HOST_FQ2
    )
    assert got == expect


@pytest.mark.slow
def test_msm_g1_table_fixed_base():
    """Fixed-base precomputed-table MSM (single merged window) matches the
    host reference, including infinity entries and a zero scalar."""
    n = 24
    base_ks = [int(k) for k in RNG.integers(1, 1 << 30, size=n)]
    points = [h_ec_mul(k, G1_GEN) for k in base_ks]
    points[5] = None  # infinity entry
    scalars = rand_scalars(n)
    scalars[7] = 0
    table = msm.g1_build_table(points, c=8, eager=True)
    got = msm.msm_g1_table(table, scalars, serial=8, eager=True)
    assert got == host_msm(points, scalars)


@pytest.mark.slow
def test_msm_g1_table_zero_result():
    """s·P + (r-s)·P + 0·Q == r·P wraps to infinity when s = -t mod r."""
    s = rand_scalars(1)[0]
    points = [G1_GEN, G1_GEN]
    scalars = [s, bn254.R - s]
    table = msm.g1_build_table(points, c=8, eager=True)
    assert msm.msm_g1_table(table, scalars, serial=2, eager=True) is None
