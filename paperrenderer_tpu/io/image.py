"""Image output: the swapchain-present analogue for a headless renderer.

The reference presents via GLFW/Vulkan swapchain (Swapchain.cpp:139-160);
headless TPU rendering writes the LDR framebuffer to PNG instead.
"""

from __future__ import annotations

import numpy as np


def read_image(data_or_path) -> np.ndarray:
    """Decode an image (PNG/JPEG/...) from bytes or a path -> u8 [H, W, C].

    The texture-upload entry point (reference Image::Image staged upload,
    VulkanResources.cpp:640-720)."""
    import io as _io

    from PIL import Image

    if isinstance(data_or_path, (bytes, bytearray, memoryview)):
        img = Image.open(_io.BytesIO(bytes(data_or_path)))
    else:
        img = Image.open(data_or_path)
    if img.mode not in ("RGB", "RGBA", "L"):
        img = img.convert("RGBA")
    return np.asarray(img)


def write_png(path: str, image) -> None:
    """Write an image to PNG. Accepts f32 [H, W, 3] in [0,1] or u8 [H, W, 3|4]."""
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    from PIL import Image

    Image.fromarray(arr).save(path)
