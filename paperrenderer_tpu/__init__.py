"""paperrenderer_tpu — a TPU-native hybrid raster + ray-tracing rendering
framework in JAX/Pallas, with the capabilities of the Vulkan PaperRenderer
library re-designed for TPU hardware.

Scene API mirrors the reference (RenderEngine / Model / ModelInstance /
Material / RenderPass / RayTraceRender / Camera); the backend is XLA + Pallas:
  * instance preprocess (cull + LOD + draw build) = fused scan/scatter kernels
  * rasterization = tile-based binned rasterizer on the MXU
  * BLAS/TLAS = implicit Morton BVHs (sort + level-wise reductions)
  * ray tracing = wavefront traversal kernels
  * the whole frame is one jitted function; multi-chip scaling via shard_map
    over screen tiles.
"""

import jax as _jax

# Geometry math cannot tolerate bf16-truncated matmuls (the platform default):
# vertex transforms, camera unprojection, and edge setup all involve
# cancellation. Force full f32 matmul precision; kernels that can afford
# lower precision opt in locally via precision= / preferred_element_type.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: frame-graph compiles over the TPU tunnel run
# 10s-minutes; cache them across processes (tests/bench/examples all pay
# the same traces). Only set when the embedding app hasn't configured one.
if not _jax.config.jax_compilation_cache_dir:
    _jax.config.update(
        "jax_compilation_cache_dir", "/tmp/paperrenderer_jax_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from .core import (
    Camera,
    CameraMatrices,
    GeometryArena,
    RenderEngine,
    Material,
    MaterialInstance,
    MaterialMesh,
    MaterialRegistry,
    Model,
    ModelInstance,
    Scene,
    make_cube,
    make_icosphere,
    make_plane,
    make_torus,
    make_uv_sphere,
)
from .utils import Logger, LogType, StatisticsTracker, Timer
from .viewer import Viewer

__version__ = "0.1.0"

__all__ = [
    "Camera", "CameraMatrices", "GeometryArena", "RenderEngine",
    "Material", "MaterialInstance", "MaterialMesh", "MaterialRegistry",
    "Model", "ModelInstance", "Scene",
    "make_cube", "make_icosphere", "make_plane", "make_torus", "make_uv_sphere",
    "Logger", "LogType", "StatisticsTracker", "Timer", "Viewer",
    "__version__",
]
