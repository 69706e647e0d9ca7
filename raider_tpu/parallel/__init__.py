"""Multi-chip scale-out: device meshes and sharded ray batches.

Two decompositions over the 1-D mesh:
  * ray sharding (mesh.shard_rays) — cube replicated, rays sharded, no
    collectives; the strong-scaling default while the table fits one chip.
  * z-slab cube sharding (zshard.integrate_rays_z_sharded) — table sharded
    into z-slabs, rays replicated, one psum; the capacity mode for cubes
    past one chip's HBM (global-model scale).
"""

from raider_tpu.parallel.mesh import get_mesh, initialize_distributed, shard_rays  # noqa: F401
from raider_tpu.parallel.zshard import integrate_rays_z_sharded, pack_cube_slabs  # noqa: F401
