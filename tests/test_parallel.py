"""Multi-device (8 virtual CPU) tests: distributed NTT + MSM structure."""

import numpy as np
import jax
import jax.numpy as jnp

from eigen_zeth_tpu.ops import goldilocks as gl
from eigen_zeth_tpu.ops import ntt as nttm
from eigen_zeth_tpu.parallel import mesh as meshm
from eigen_zeth_tpu.parallel.ntt_dist import intt_sharded, ntt_sharded

RNG = np.random.default_rng(0xD157)


def test_mesh_shapes():
    m = meshm.make_mesh()
    assert m.shape[meshm.DOMAIN_AXIS] == len(jax.devices())
    m2 = meshm.make_mesh(n_domain=4, n_chunk=2)
    assert m2.shape[meshm.CHUNK_AXIS] == 2
    assert m2.shape[meshm.DOMAIN_AXIS] == 4


def test_ntt_sharded_matches_single():
    m = meshm.make_mesh()  # 8-way domain
    for n, rows in [(256, 16)]:
        v = RNG.integers(0, gl.P, size=n, dtype=np.uint64)
        x = gl.from_int(v)
        expect = gl.to_int(nttm.ntt(x))
        got = gl.to_int(ntt_sharded(x, m, rows=rows))
        np.testing.assert_array_equal(got, expect)


def test_ntt_sharded_roundtrip():
    m = meshm.make_mesh()
    n, rows = 1 << 10, 32
    v = RNG.integers(0, gl.P, size=n, dtype=np.uint64)
    x = gl.from_int(v)
    y = ntt_sharded(x, m, rows=rows)
    back = intt_sharded(y, m, rows=rows)
    np.testing.assert_array_equal(gl.to_int(back), v)


def test_ntt_sharded_output_is_sharded():
    m = meshm.make_mesh()
    n = 1 << 10
    x = gl.from_int(RNG.integers(0, gl.P, size=n, dtype=np.uint64))
    y = ntt_sharded(x, m, rows=32)
    # output really is distributed over the domain axis
    assert len(y.lo.sharding.device_set) == len(jax.devices())


def test_msm_window_sums_distributed_structure():
    """Multi-chip MSM pipeline with the mock Int group: points sharded
    across devices, per-device window sums, cross-device reduction —
    validates sort/scan/scatter/reduce + collectives with numpy."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from eigen_zeth_tpu.ops import msm as msmm
    from eigen_zeth_tpu.parallel.msm_dist import msm_dist_int_mock

    m = meshm.make_mesh()
    n, c = 256, 4
    values = RNG.integers(0, 1 << 32, size=n, dtype=np.uint32)
    scalars = [int(s) for s in RNG.integers(0, 1 << 31, size=n)]
    digits = jnp.asarray(msmm.scalar_digits(scalars, c=c, nbits=32))
    got = msm_dist_int_mock(m, jnp.asarray(values), digits, c=c)
    expect = sum(int(v) * s for v, s in zip(values, scalars)) % (1 << 32)
    assert int(np.asarray(got)) == expect
