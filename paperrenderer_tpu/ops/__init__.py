from . import preprocess, raster, shading, tonemap

__all__ = ["preprocess", "raster", "shading", "tonemap"]
