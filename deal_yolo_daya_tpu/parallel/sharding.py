"""NamedShardings for the train/eval step.

DP recipe (the scaling-book pattern): batch dims sharded over the mesh `data`
axis, parameters/optimizer state replicated; under jit the compiler inserts
the psum grad all-reduce over ICI automatically. BatchNorm reduces over the
global batch dim, which gives synchronized BN across replicas for free
(SURVEY §7 hard part (f)).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch_tree: Any) -> Any:
    """Place a host batch pytree onto the mesh, sharded along axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch_tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
