"""Image output: the swapchain-present analogue for a headless renderer.

The reference presents via GLFW/Vulkan swapchain (Swapchain.cpp:139-160);
headless TPU rendering writes the LDR framebuffer to PNG instead.
"""

from __future__ import annotations

import numpy as np


def write_png(path: str, image) -> None:
    """Write an image to PNG. Accepts f32 [H, W, 3] in [0,1] or u8 [H, W, 3|4]."""
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    from PIL import Image

    Image.fromarray(arr).save(path)
