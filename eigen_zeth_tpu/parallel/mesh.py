"""Device-mesh construction for the proving pipeline.

Two mesh axes mirror the reference's two levels of fan-out
(SURVEY.md §2 parallelism inventory):

  * 'chunk'  — data parallelism over batch chunks (the analog of the
               reference's GenBatchChunks fan-out to its prover network,
               proto/prover/v1/prover.proto:49-66)
  * 'domain' — model/tensor parallelism *inside* one proof: the
               polynomial evaluation domain sharded across chips, with
               NTT stage exchange riding ICI all_to_all

For multi-host deployments call jax.distributed.initialize() before
building the mesh; devices then span hosts and XLA routes collectives
over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHUNK_AXIS = "chunk"
DOMAIN_AXIS = "domain"


def make_mesh(n_domain: int | None = None, n_chunk: int = 1, devices=None) -> Mesh:
    """Build a (chunk, domain) mesh; defaults to all devices on 'domain'."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_domain is None:
        n_domain = len(devices) // n_chunk
    assert n_chunk * n_domain <= len(devices), (
        f"need {n_chunk * n_domain} devices, have {len(devices)}"
    )
    grid = np.array(devices[: n_chunk * n_domain]).reshape(n_chunk, n_domain)
    return Mesh(grid, (CHUNK_AXIS, DOMAIN_AXIS))


def domain_sharding(mesh: Mesh, rank: int = 1, axis: int = -1) -> NamedSharding:
    """Shard one array axis over the domain axis, replicate the rest."""
    spec = [None] * rank
    spec[axis] = DOMAIN_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
