from . import animation, bvh, preprocess, raster, shading, tonemap, trace

__all__ = ["animation", "bvh", "preprocess", "raster", "shading", "tonemap", "trace"]
