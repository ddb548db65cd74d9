from .renderpass import RenderPass, render_frame

__all__ = ["RenderPass", "render_frame"]
