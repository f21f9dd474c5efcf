"""Microbenchmark: which part of the MSM 'gather' stage is slow on TPU?

  a) argsort (1, M) uint32
  b) lax.sort 3-operand (mag, sign, iota) num_keys=1
  c) row gather: take (M, 32)-row table by (M,) random idx
  d) element gather: take_along_axis (1, M) by (1, M)

Usage: python scripts/prof_gather.py [m_log2]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

m_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 22
M = 1 << m_log2
R = 32

rng = np.random.default_rng(0)
mag = jnp.asarray(rng.integers(0, 1 << 15, size=(1, M), dtype=np.uint32))
sign = jnp.asarray(rng.integers(0, 2, size=(1, M), dtype=np.uint32))
rows = jnp.asarray(rng.integers(0, 1 << 30, size=(M, R), dtype=np.uint32))
perm = jnp.asarray(rng.permutation(M).astype(np.int32))


def checksum(x):
    return jax.tree_util.tree_reduce(
        lambda a, l: a + jnp.sum(l.astype(jnp.uint32)), x, jnp.uint32(0)
    )


def timeit(f, *a, iters=5):
    # reduce on device: np.asarray of a big output would drag it through
    # the axon host tunnel and time THAT, not the kernel
    g = jax.jit(lambda *a: checksum(f(*a)))
    r = g(*a)
    np.asarray(r)
    t0 = time.time()
    for _ in range(iters):
        r = g(*a)
    np.asarray(r)
    return (time.time() - t0) / iters * 1e3


def f_argsort(m):
    return jnp.argsort(m, axis=-1)


def f_sort3(m, s):
    iota = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (1, M), 1), m.shape
    )
    return jax.lax.sort((m, s, iota), dimension=-1, num_keys=1)


def f_rowgather(t, p):
    return jnp.take(t, p, axis=0)


def f_rowgather_pib(t, p):
    return t.at[p].get(mode="promise_in_bounds")


def f_elemgather(m, p):
    return jnp.take_along_axis(m, p[None, :], axis=-1)


print(f"M = 2^{m_log2}, rows {R} uint32")
print(f"argsort:            {timeit(f_argsort, mag):9.2f} ms")
print(f"sort3 (mag,sg,idx): {timeit(f_sort3, mag, sign):9.2f} ms")
rt = timeit(f_rowgather, rows, perm)
print(f"row take:           {rt:9.2f} ms ({M * R * 4 / rt * 1e3 / 1e9:.1f} GB/s)")
print(f"row take (pib):     {timeit(f_rowgather_pib, rows, perm):9.2f} ms")
print(f"elem take_along:    {timeit(f_elemgather, mag, perm):9.2f} ms")
