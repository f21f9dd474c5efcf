"""Distributed NTT: evaluation domain sharded over the mesh, butterfly
stage exchange as all_to_all over ICI.

This is the TPU answer to the reference's "split the batch into chunks and
ship them over gRPC" scaling model (proto/prover/v1/prover.proto:49-66) —
BASELINE config 4 (FRI on 2^22 poly, all-to-all NTT exchange) and the
sequence-parallel analog from SURVEY.md §5: the polynomial degree is the
prover's 'long context', sharded like sequence parallelism shards tokens.

Design: the four-step factorization N = R·C (ops/ntt.py) splits the
transform into two banks of *local* NTTs separated by one global
transpose.  With the (R, C) matrix sharded along columns:

  1. size-R NTTs along axis 0           — local, zero communication
  2. four-step twiddle multiply          — local (twiddle sharded alike)
  3. all_to_all: cols-sharded -> rows-sharded   [the only ICI traffic]
  4. size-C NTTs along axis 1           — local
  5. all_to_all + local transpose back to natural-order row sharding

Total comm: 2·N elements per device pair group — asymptotically the same
O(N/D) per-device traffic as the classic transpose algorithm, and XLA
schedules both exchanges as tiled all_to_alls on ICI.

Everything is expressed with shard_map so the collective schedule is
explicit; under jit the local NTT stages fuse into the usual uint32
limb pipelines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import goldilocks as gl
from ..ops import ntt as nttm
from ..ops.goldilocks import GF
from .mesh import DOMAIN_AXIS


def _local_ntt_axis0(x: GF, plan) -> GF:
    """NTT along axis 0 of a 2-D local block (transpose to last axis).

    Uses the unscaled butterfly core; the four-step plan applies the
    single global 1/n scale at the end for inverse transforms."""
    xt = gl.transpose(x, (1, 0))
    return gl.transpose(nttm._raw(xt, plan), (1, 0))


def _ntt_sharded_impl(x: GF, mesh: Mesh, rows: int, inverse: bool) -> GF:
    n = x.lo.shape[-1]
    d = mesh.shape[DOMAIN_AXIS]
    plan = nttm.make_four_step_plan(n, rows, inverse)
    R, C = plan.rows, plan.cols
    assert R % d == 0 and C % d == 0, (R, C, d)

    col_sharded = NamedSharding(mesh, P(None, DOMAIN_AXIS))

    def local_fn(x_lo, x_hi, tw_lo, tw_hi):
        blk = GF(x_lo, x_hi)  # (R, C/d)
        blk = _local_ntt_axis0(blk, plan.row_plan)
        blk = gl.mul(blk, GF(tw_lo, tw_hi))
        # cols-sharded -> rows-sharded: (R, C/d) -> (R/d, C)
        blk = GF(
            jax.lax.all_to_all(blk.lo, DOMAIN_AXIS, 0, 1, tiled=True),
            jax.lax.all_to_all(blk.hi, DOMAIN_AXIS, 0, 1, tiled=True),
        )
        blk = nttm._raw(blk, plan.col_plan)  # (R/d, C): k1-block of Y[k1, k2]
        # natural order X[k1 + k2·R]: device p must hold Y[:, k2-block p]^T
        blk = GF(
            jax.lax.all_to_all(blk.lo, DOMAIN_AXIS, 1, 0, tiled=True),
            jax.lax.all_to_all(blk.hi, DOMAIN_AXIS, 1, 0, tiled=True),
        )  # (R, C/d) = Y[:, block]
        out = gl.transpose(blk, (1, 0))  # (C/d, R) = X rows block
        out = gl.reshape(out, (C // d * R,))
        if plan.scale is not None:
            s = plan.scale
            out = gl.mul(
                out, GF(jnp.broadcast_to(s.lo, out.lo.shape), jnp.broadcast_to(s.hi, out.hi.shape))
            )
        return out.lo, out.hi

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, DOMAIN_AXIS),
            P(None, DOMAIN_AXIS),
            P(None, DOMAIN_AXIS),
            P(None, DOMAIN_AXIS),
        ),
        out_specs=(P(DOMAIN_AXIS), P(DOMAIN_AXIS)),
    )

    xm = gl.reshape(x, (R, C))
    xm = GF(
        jax.device_put(xm.lo, col_sharded), jax.device_put(xm.hi, col_sharded)
    )
    tw = plan.twiddle
    tw = GF(jax.device_put(tw.lo, col_sharded), jax.device_put(tw.hi, col_sharded))
    out_lo, out_hi = fn(xm.lo, xm.hi, tw.lo, tw.hi)
    return GF(out_lo, out_hi)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def ntt_sharded(x: GF, mesh: Mesh, rows: int, inverse: bool = False) -> GF:
    """NTT of a (n,)-shaped GF array sharded over the 'domain' mesh axis.

    Natural order in, natural order out; output sharded the same way.
    rows (R) picks the four-step split n = R·C; both R and C must be
    divisible by the mesh's domain size.  jit-wrapped: shard_map outside
    jit falls back to a per-primitive eager path with ~70ms/op dispatch
    overhead."""
    return _ntt_sharded_impl(x, mesh, rows, inverse)


def intt_sharded(x: GF, mesh: Mesh, rows: int) -> GF:
    return ntt_sharded(x, mesh, rows, True)
