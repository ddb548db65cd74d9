"""RenderEngine: the top-level facade and frame lifecycle.

Reference parity: ``RenderEngine`` (src/PaperRenderer/PaperRenderer.h:44-129)
owns the logger, statistics tracker, device, global registries, and the
per-frame begin/end lifecycle. The TPU engine owns:

  Logger -> StatisticsTracker -> Scene (geometry arena + model/instance
  registries) -> MaterialRegistry

``begin_frame`` clears per-frame stats and flushes pending scene deltas (the
queueModelsAndInstancesTransfers + staging submit analogue,
PaperRenderer.cpp:365-386); ``end_frame`` advances the frame counter and
records frame time (:388-404). There is no swapchain: presentation is the
caller writing the returned framebuffer wherever it wants (io.write_png).

GPU concepts that intentionally have NO analogue here (XLA subsumes them):
command pools (Command.cpp), queue ownership tracking (VulkanResources.cpp:59),
descriptor pools (Descriptor.cpp), timeline semaphores (frame graph =
data dependence inside the jitted frame function).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

from ..utils.logging import Logger, LogType
from ..utils.stats import StatisticsTracker, TimeStatisticInterval, Timer
from .geometry import GeometryArena
from .material import MaterialRegistry
from .scene import InstanceArrays, Scene


class RenderEngine:
    """Top-level engine facade (reference PaperRenderer.h:44-129)."""

    def __init__(
        self,
        *,
        log_callback: Optional[Callable] = None,
        device_check: bool = True,
    ):
        self.logger = Logger(log_callback)
        self.statistics = StatisticsTracker()
        self.scene = Scene(GeometryArena())
        self.materials = MaterialRegistry()
        self._frame = 0
        self._last_frame_time = time.perf_counter()
        self.delta_time = 0.0

        if device_check:
            import jax

            devs = jax.devices()
            self.logger.info(
                f"RenderEngine initialized on {devs[0].platform} "
                f"({len(devs)} device(s))"
            )

    # -- frame lifecycle (beginFrame/endFrame, PaperRenderer.cpp:365-404) ---
    def begin_frame(self) -> InstanceArrays:
        """Clear per-frame stats, flush scene deltas to device; returns the
        current instance SoA (what beginFrame's staging submit produced)."""
        self.statistics.clear()
        with Timer(self.statistics, "Begin Frame"):
            arrays = self.scene.flush()
        return arrays

    def end_frame(self) -> None:
        self._frame += 1
        now = time.perf_counter()
        self.delta_time = now - self._last_frame_time
        self._last_frame_time = now
        self.statistics.insert_time_statistic(
            "Frame", TimeStatisticInterval.REGULAR, self.delta_time
        )

    @property
    def frame_number(self) -> int:
        return self._frame

    @property
    def buffer_index(self) -> int:
        """frame % 2 — kept for API parity (PaperRenderer.h:112); double
        buffering is handled by XLA donation, not user code."""
        return self._frame % 2

    # -- object creation helpers (the user-facing construction surface) -----
    def create_render_pass(self, **kwargs):
        from ..render.renderpass import RenderPass

        return RenderPass(self.scene, self.materials, **kwargs)

    def create_ray_trace_render(self, **kwargs):
        from ..render.raytrace import RayTraceRender

        return RayTraceRender(self.scene, self.materials, **kwargs)

    def create_hybrid_render(self, **kwargs):
        from ..render.hybrid import HybridRender

        return HybridRender(self.scene, self.materials, **kwargs)
