from .renderpass import RenderPass, render_frame
from .raytrace import RayTraceRender, rt_frame, build_world_scene, make_rt_frame
from .hybrid import HybridRender, make_hybrid_frame

__all__ = [
    "RenderPass", "render_frame",
    "RayTraceRender", "rt_frame", "build_world_scene", "make_rt_frame",
    "HybridRender", "make_hybrid_frame",
]
