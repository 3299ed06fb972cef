"""Device mesh + sharding layer (DP over ICI; TP hooks for wide scales)."""

from .mesh import create_mesh, device_summary, mesh_from_spec  # noqa: F401
from .sharding import batch_sharding, replicate_sharding, shard_batch  # noqa: F401
