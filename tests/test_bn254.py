"""BN254: Montgomery limb arithmetic + generic Jacobian curve ops vs bigints."""

import numpy as np

from eigen_zeth_tpu.ops import bn254
from eigen_zeth_tpu.ops.bn254 import (
    FqOps,
    Fq2Ops,
    G1_GEN,
    G2_GEN_X,
    G2_GEN_Y,
    HOST_FQ,
    HOST_FQ2,
    PointJ,
    point_add,
    point_double,
    to_affine,
    from_affine,
    h_ec_add,
    h_ec_mul,
    h_on_curve_g1,
    h_on_curve_g2,
)

RNG = np.random.default_rng(0xB254)


def rand_mod(q, n):
    return [int.from_bytes(RNG.bytes(40), "big") % q for _ in range(n)]


def test_mont_roundtrip_and_ops():
    for modulus in [bn254.Q, bn254.R]:
        ctx = bn254.mont_ctx(modulus)
        a = rand_mod(modulus, 64)
        b = rand_mod(modulus, 64)
        da, db = ctx.from_int(a), ctx.from_int(b)
        np.testing.assert_array_equal(ctx.to_int(da), np.array(a, dtype=object))
        got_add = ctx.to_int(ctx.add(da, db))
        got_sub = ctx.to_int(ctx.sub(da, db))
        got_mul = ctx.to_int(ctx.mont_mul(da, db))
        for i in range(64):
            assert int(got_add[i]) == (a[i] + b[i]) % modulus
            assert int(got_sub[i]) == (a[i] - b[i]) % modulus
            assert int(got_mul[i]) == (a[i] * b[i]) % modulus


def test_mont_mul_is_field_mul_after_form():
    ctx = bn254.fq()
    a = rand_mod(bn254.Q, 32)
    b = rand_mod(bn254.Q, 32)
    # from_int puts values in Montgomery form; mont_mul keeps the form
    got = ctx.to_int(ctx.mont_mul(ctx.from_int(a), ctx.from_int(b)))
    for i in range(32):
        assert int(got[i]) == (a[i] * b[i]) % bn254.Q


def test_mont_edge_values():
    ctx = bn254.fq()
    edge = [0, 1, 2, bn254.Q - 1, bn254.Q - 2, (1 << 255) % bn254.Q]
    pairs = [(x, y) for x in edge for y in edge]
    a = [x for x, _ in pairs]
    b = [y for _, y in pairs]
    da, db = ctx.from_int(a), ctx.from_int(b)
    got_add = ctx.to_int(ctx.add(da, db))
    got_mul = ctx.to_int(ctx.mont_mul(da, db))
    got_neg = ctx.to_int(ctx.neg(da))
    for i, (x, y) in enumerate(pairs):
        assert int(got_add[i]) == (x + y) % bn254.Q
        assert int(got_mul[i]) == (x * y) % bn254.Q
        assert int(got_neg[i]) == (-x) % bn254.Q


def test_mont_inv_pow():
    ctx = bn254.fq()
    a = rand_mod(bn254.Q, 16)
    a[0] = 1
    inv = ctx.to_int(ctx.inv(ctx.from_int(a)))
    for x, ix in zip(a, inv):
        assert (x * int(ix)) % bn254.Q == 1
    assert int(ctx.to_int(ctx.inv(ctx.from_int([0])))[0]) == 0


def test_generators_on_curve():
    assert h_on_curve_g1(G1_GEN)
    assert h_on_curve_g2((G2_GEN_X, G2_GEN_Y))
    # generators have order r
    assert h_ec_mul(bn254.R, G1_GEN) is None
    assert h_ec_mul(bn254.R, (G2_GEN_X, G2_GEN_Y), HOST_FQ2) is None


def _host_points_g1(ks):
    return [h_ec_mul(k, G1_GEN) for k in ks]


def _device_g1(points, F):
    xs = F.ctx.from_int([p[0] for p in points])
    ys = F.ctx.from_int([p[1] for p in points])
    return from_affine(F, xs, ys)


def test_device_g1_add_matches_host():
    F = FqOps()
    ks1 = [1, 2, 3, 5, 12345, 999999]
    ks2 = [7, 11, 3, 5, 54321, 1]
    p1 = _host_points_g1(ks1)
    p2 = _host_points_g1(ks2)
    dp1 = _device_g1(p1, F)
    dp2 = _device_g1(p2, F)
    out = point_add(F, dp1, dp2)
    ax, ay = to_affine(F, out)
    gx, gy = F.to_int(ax), F.to_int(ay)
    for i, (k1, k2) in enumerate(zip(ks1, ks2)):
        expect = h_ec_mul(k1 + k2, G1_GEN)
        if k1 == k2:
            expect = h_ec_mul(2 * k1, G1_GEN)
        assert (int(gx[i]), int(gy[i])) == expect, f"i={i}"


def test_device_g1_double_matches_host():
    F = FqOps()
    ks = [1, 2, 9, 1 << 20]
    pts = _host_points_g1(ks)
    d = _device_g1(pts, F)
    out = point_double(F, d)
    ax, ay = to_affine(F, out)
    gx, gy = F.to_int(ax), F.to_int(ay)
    for i, k in enumerate(ks):
        assert (int(gx[i]), int(gy[i])) == h_ec_mul(2 * k, G1_GEN)


def test_device_g1_add_special_cases():
    F = FqOps()
    g = h_ec_mul(5, G1_GEN)
    neg_g = (g[0], (-g[1]) % bn254.Q)
    # [P, inf, P] + [-P, P, P]  ->  [inf, P, 2P]
    xs = F.ctx.from_int([g[0], 0, g[0]])
    ys = F.ctx.from_int([g[1], 0, g[1]])
    z_mask = np.array([False, True, False])
    a = from_affine(F, xs, ys, is_inf=z_mask)
    xs2 = F.ctx.from_int([neg_g[0], g[0], g[0]])
    ys2 = F.ctx.from_int([neg_g[1], g[1], g[1]])
    b = from_affine(F, xs2, ys2)
    out = point_add(F, a, b)
    inf_flags = np.asarray(F.is_zero(out.z))
    assert inf_flags[0] and not inf_flags[1] and not inf_flags[2]
    ax, ay = to_affine(F, out)
    gx, gy = F.to_int(ax), F.to_int(ay)
    assert (int(gx[1]), int(gy[1])) == g
    assert (int(gx[2]), int(gy[2])) == h_ec_mul(10, G1_GEN)


def test_device_g2_add_matches_host():
    F = Fq2Ops()
    g2 = (G2_GEN_X, G2_GEN_Y)
    ks1 = [1, 3, 8]
    ks2 = [2, 3, 5]
    p1 = [h_ec_mul(k, g2, HOST_FQ2) for k in ks1]
    p2 = [h_ec_mul(k, g2, HOST_FQ2) for k in ks2]

    def dev(points):
        x = (
            F.fq.ctx.from_int([p[0][0] for p in points]),
            F.fq.ctx.from_int([p[0][1] for p in points]),
        )
        y = (
            F.fq.ctx.from_int([p[1][0] for p in points]),
            F.fq.ctx.from_int([p[1][1] for p in points]),
        )
        return from_affine(F, x, y)

    out = point_add(F, dev(p1), dev(p2))
    ax, ay = to_affine(F, out)
    (x0, x1), (y0, y1) = F.to_int(ax), F.to_int(ay)
    for i, (k1, k2) in enumerate(zip(ks1, ks2)):
        expect = h_ec_mul(k1 + k2, g2, HOST_FQ2)
        got = ((int(x0[i]), int(x1[i])), (int(y0[i]), int(y1[i])))
        assert got == expect, f"i={i}"
