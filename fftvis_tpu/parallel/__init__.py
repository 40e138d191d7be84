"""Device-mesh parallelism (SPMD meshes + multi-host bring-up)."""

from .mesh import (  # noqa: F401
    auto_mesh,
    init_distributed,
    make_mesh,
    simulate_vis_sharded,
)

__all__ = [
    "auto_mesh",
    "init_distributed",
    "make_mesh",
    "simulate_vis_sharded",
]
