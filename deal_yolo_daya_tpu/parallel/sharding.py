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


def tp_param_shardings(params: Any, mesh: Mesh, min_channels: int = 256) -> Any:
    """Tensor-parallel NamedShardings for a conv param tree via GSPMD.

    Kernels whose output-channel dim is wide enough (and divisible by the
    `model` axis) are sharded on that last dim; XLA's sharding propagation
    then channel-shards the corresponding activations and inserts the
    needed collectives over ICI. Everything else (biases, BN, narrow convs)
    stays replicated. This targets the yolo11x/imgsz-1280 activation-memory
    pressure called out in SURVEY §2.3; with model axis == 1 it degenerates
    to full replication.
    """
    n_model = mesh.shape.get("model", 1)

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        if (
            n_model > 1
            and len(shape) == 4                      # HWIO conv kernel
            and shape[-1] >= min_channels
            and shape[-1] % n_model == 0
        ):
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)
