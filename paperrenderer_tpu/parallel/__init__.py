from .mesh import make_tile_mesh
from .tiles import (
    make_sharded_hybrid_frame,
    make_sharded_rt_frame,
    measure_sharded_demand,
    sharded_render_frame,
    sharded_render_frame_static,
    sharded_rt_frame,
)

__all__ = [
    "make_tile_mesh",
    "make_sharded_hybrid_frame",
    "make_sharded_rt_frame",
    "measure_sharded_demand",
    "sharded_render_frame",
    "sharded_render_frame_static",
    "sharded_rt_frame",
]
