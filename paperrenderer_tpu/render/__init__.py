from .renderpass import RenderPass, render_frame
from .raytrace import RayTraceRender, rt_frame, build_world_scene
from .hybrid import HybridRender, hybrid_frame

__all__ = [
    "RenderPass", "render_frame",
    "RayTraceRender", "rt_frame", "build_world_scene",
    "HybridRender", "hybrid_frame",
]
