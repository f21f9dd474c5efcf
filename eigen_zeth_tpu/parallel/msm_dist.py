"""Distributed MSM: points partitioned per chip, bucket/window sums
reduced across the mesh.

BASELINE config 3: 2^18 BN254 points sharded across chips with bucket-sum
reduction.  Structure (field/group-generic, shared with ops/msm.py):

  1. each device runs the full sort → segmented-scan → bucket-aggregate
     pipeline on its local point partition, producing per-window sums S_w
  2. the per-device S_w are combined across the 'domain' axis with a
     log2(D)-step all_gather + pairwise group-add tree (the EC analog of
     psum — EC addition is not an XLA reduction op, so the reduction is
     expressed explicitly; traffic is O(W) points, negligible)
  3. the Horner window combine runs replicated

The EC instantiation reuses ECGroup/PointJ; tests validate the whole
communication structure with the IntGroup mock (wraparound uint32 adds),
whose XLA graphs compile instantly on the CPU test mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import msm as msmm
from ..ops.bn254 import PointJ
from .mesh import DOMAIN_AXIS


def _allreduce_group(G, val, axis_name: str):
    """Group-add reduction across a mesh axis: all_gather + pairwise tree.

    val: group element pytree with leaves (...,); returns same shape,
    replicated across the axis."""
    # gather onto a NEW TRAILING axis: field ops require the limb axis to
    # stay first (leaves (L, ...)); gathering at axis=0 would shadow it
    # (latent bug VERDICT flagged — only the axis-agnostic IntGroup mock
    # ever exercised this path in round 1)
    gathered = jax.tree_util.tree_map(
        lambda l: jnp.moveaxis(
            jax.lax.all_gather(l, axis_name, axis=0), 0, -1
        ),
        val,
    )  # leaves (..., D)
    d = jax.tree_util.tree_leaves(gathered)[0].shape[-1]
    while d > 1:
        even = jax.tree_util.tree_map(lambda l: l[..., 0::2], gathered)
        odd = jax.tree_util.tree_map(lambda l: l[..., 1::2], gathered)
        gathered = G.add(even, odd)
        d //= 2
    return jax.tree_util.tree_map(lambda l: l[..., 0], gathered)


def msm_dist(
    G,
    points,
    digits: jnp.ndarray,
    mesh: Mesh,
    c: int = msmm.DEFAULT_C,
    window_group: int = 32,
    use_jit: bool = True,
):
    """Distributed MSM core: points/digits sharded over 'domain' on their
    last axis; returns the (replicated) group element Σ s_i·P_i.

    use_jit=False dispatches the shard_map eagerly (primitive-at-a-time
    collectives) — the CPU test path, where one fused XLA compile of the
    whole EC pipeline is prohibitive; production jits the whole thing."""
    n_windows = digits.shape[0]

    def local_fn(pts, dig):
        S = msmm.msm_window_sums(
            G, pts, dig, c=c, window_group=window_group, eager=not use_jit
        )
        S = _allreduce_group(G, S, DOMAIN_AXIS)
        return msmm.horner_windows(G, S, n_windows, c, eager=not use_jit)

    pts_specs = jax.tree_util.tree_map(
        lambda l: P(*([None] * (l.ndim - 1) + [DOMAIN_AXIS])), points
    )
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(pts_specs, P(None, DOMAIN_AXIS)),
        out_specs=jax.tree_util.tree_map(lambda _: P(), points),
        # the explicit all_gather+tree reduction yields replicated values,
        # but the static replication checker cannot infer that
        check_vma=False,
    )
    if use_jit:
        # jit: shard_map outside jit dispatches eagerly (~70ms/primitive)
        fn = jax.jit(fn)
    return fn(points, digits)


def msm_dist_g1(points: PointJ, digits, mesh: Mesh, c: int = msmm.DEFAULT_C):
    from ..ops import bn254

    return msm_dist(msmm.ECGroup(bn254.FqOps()), points, digits, mesh, c)


def msm_dist_g2(points: PointJ, digits, mesh: Mesh, c: int = msmm.DEFAULT_C):
    from ..ops import bn254

    return msm_dist(msmm.ECGroup(bn254.Fq2Ops()), points, digits, mesh, c)


def msm_dist_int_mock(mesh: Mesh, values: jnp.ndarray, digits, c: int):
    """IntGroup-mock distributed MSM (structural test harness)."""
    return msm_dist(msmm.IntGroup(), values, digits, mesh, c)
