"""Post-process chain: exposure -> white balance -> contrast/brightness ->
color filter -> saturation -> Hill ACES tonemap -> gamma.

Pixel-exact port of the behavior of the reference's fullscreen tonemap pass
(example/resources/shaders/BufferCopy.frag:22-136). On TPU this is one fused
elementwise pass over the HDR image; XLA fuses the entire chain into the
shading epilogue, so the reference's extra fullscreen raster pass costs
nothing here.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

# Hill ACES fit matrices (BufferCopy.frag:66-89). The GLSL idiom
# `pixel * mat3(a,b,c, ...)` computes out_j = dot(j-th written triple, pixel),
# i.e. out = M @ pixel with M's rows as written below — matching the standard
# HLSL Hill fit. Rows are applied by _mat3 (unrolled elementwise): a
# per-pixel [.., 3] @ [3, 3] MXU matmul pads 3 -> 128 on both operands
# (~40x wasted work, 6x more at highest precision — measured ~11 ms of a
# 1080p tonemap); the unrolled form fuses into the elementwise chain.
_ACES_INPUT = (
    (0.59719, 0.35458, 0.04823),
    (0.07600, 0.90834, 0.01566),
    (0.02840, 0.13383, 0.83777),
)
_ACES_OUTPUT = (
    (1.60475, -0.53108, -0.07367),
    (-0.10208, 1.10813, -0.00605),
    (-0.00327, -0.07276, 1.07602),
)

_LIN_2_LMS = (
    (3.90405e-1, 5.49941e-1, 8.92632e-3),
    (7.08416e-2, 9.63172e-1, 1.35775e-3),
    (2.31082e-2, 1.28021e-1, 9.36245e-1),
)
_LMS_2_LIN = (
    (2.85847e0, -1.62879e0, -2.48910e-2),
    (-2.10182e-1, 1.15820e0, 3.24281e-4),
    (-4.18120e-2, -1.18169e-1, 1.06867e0),
)


def _mat3(rgb: jax.Array, m) -> jax.Array:
    """out = rgb @ m.T with python-constant rows, unrolled elementwise."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return jnp.stack(
        [
            m[0][0] * r + m[0][1] * g + m[0][2] * b,
            m[1][0] * r + m[1][1] * g + m[1][2] * b,
            m[2][0] * r + m[2][1] * g + m[2][2] * b,
        ],
        axis=-1,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TonemapParams:
    """Matches the reference UBO (BufferCopy.frag:8-18)."""

    color_filter: jax.Array  # f32[3]
    exposure: jax.Array      # f32[]
    wb_temp: jax.Array
    wb_tint: jax.Array
    contrast: jax.Array
    brightness: jax.Array
    saturation: jax.Array
    gamma: jax.Array

    @staticmethod
    def default() -> "TonemapParams":
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return TonemapParams(
            color_filter=f32([1.0, 1.0, 1.0]),
            exposure=f32(1.0),
            wb_temp=f32(0.0),
            wb_tint=f32(0.0),
            contrast=f32(1.0),
            brightness=f32(0.0),
            saturation=f32(1.0),
            gamma=f32(1.0),
        )


def white_balance(rgb: jax.Array, temperature: jax.Array, tint: jax.Array) -> jax.Array:
    """LMS-space white balance (BufferCopy.frag:23-64)."""
    t1 = temperature * 10.0 / 6.0
    t2 = tint * 10.0 / 6.0
    x = 0.31271 - t1 * jnp.where(t1 < 0, 0.1, 0.05)
    std_y = 2.87 * x - 3.0 * x * x - 0.27509507
    y = std_y + t2 * 0.05
    big_y = 1.0
    big_x = big_y * x / y
    big_z = big_y * (1.0 - x - y) / y
    l = 0.7328 * big_x + 0.4296 * big_y - 0.1624 * big_z
    m = -0.7036 * big_x + 1.6975 * big_y + 0.0061 * big_z
    s = 0.0030 * big_x + 0.0136 * big_y + 0.9834 * big_z
    w1 = jnp.asarray([0.949237, 1.03542, 1.08728], jnp.float32)
    balance = w1 / jnp.stack([l, m, s])
    lms = _mat3(rgb, _LIN_2_LMS)
    lms = lms * balance
    return _mat3(lms, _LMS_2_LIN)


def hill_aces(rgb: jax.Array) -> jax.Array:
    """Hill ACES fit (BufferCopy.frag:66-89)."""
    c = _mat3(rgb, _ACES_INPUT)
    a = c * (c + 0.0245786) - 0.000090537
    b = c * (0.983729 * c + 0.4329510) + 0.238081
    c = a / b
    c = _mat3(c, _ACES_OUTPUT)
    return jnp.clip(c, 0.0, 1.0)


def tonemap(hdr: jax.Array, params: TonemapParams | None = None) -> jax.Array:
    """HDR f32[..., 3] -> LDR f32[..., 3] in [0, 1] (BufferCopy.frag main)."""
    p = params or TonemapParams.default()
    px = jnp.maximum(hdr * p.exposure, 0.0)
    px = jnp.maximum(white_balance(px, p.wb_temp, p.wb_tint), 0.0)
    px = jnp.maximum(p.contrast * (px - 0.5) + 0.5 + p.brightness, 0.0)
    px = px * p.color_filter
    gray = jnp.sum(px * jnp.asarray([0.299, 0.587, 0.114], jnp.float32), axis=-1, keepdims=True)
    px = jnp.maximum(gray + (px - gray) * p.saturation, 0.0)
    px = hill_aces(px)
    return jnp.power(px, p.gamma)


def to_srgb_u8(ldr: jax.Array) -> jax.Array:
    """LDR [0,1] -> u8, sRGB-encoded (the swapchain's SRGB format step)."""
    x = jnp.clip(ldr, 0.0, 1.0)
    srgb = jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * jnp.power(x, 1.0 / 2.4) - 0.055)
    return jnp.round(srgb * 255.0).astype(jnp.uint8)
