"""Multi-chip scale-out: device meshes and sharded ray batches."""

from raider_tpu.parallel.mesh import get_mesh, initialize_distributed, shard_rays  # noqa: F401
