"""Texture atlas + TPU-native sampling.

Reference parity: ``Image`` — staged upload, blit-chain mip generation,
views/samplers (src/PaperRenderer/VulkanResources.cpp:640-1003). The TPU
redesign packs ALL textures (and their mip chains, box-filtered at upload
like the reference's blit chain ``generateMipmaps``) into ONE device atlas,
because samplers become gathers and the gather cost model is "count the
rows":

  * texels are stored as PAIRS — ``pairs f32[H*W]``-style rows holding
    (texel[x], texel[x+1]) as two bitcast RGBA8 words — so one bilinear tap
    row (two x-adjacent texels) costs ONE row gather; a full bilinear sample
    is TWO gathers (y0 and y1 rows);
  * per-(texture, mip) placement rects live in a small table resolved by a
    one-hot matmul (tables are tiny; one-hot beats per-pixel gathers);
  * mip level is an explicit argument — the deferred shading path computes
    it from image-space uv derivatives (quad-derivative analogue).

Colors are linearized (sRGB -> linear) at upload, matching the reference's
``VK_FORMAT_*_SRGB`` views doing the conversion in hardware.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_MIPS = 8


def _srgb_to_linear(x: np.ndarray) -> np.ndarray:
    a = x / 255.0
    return np.where(a <= 0.04045, a / 12.92, ((a + 0.055) / 1.055) ** 2.4)


def _to_rgba8(img: np.ndarray, srgb: bool) -> np.ndarray:
    """Any (h, w, 1|3|4) u8/f32 image -> linear RGBA8."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8:
        img = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
        img = (img * 255.0 + 0.5).astype(np.uint8)
    if srgb:
        lin = np.clip(_srgb_to_linear(img[..., :3].astype(np.float32)) * 255.0
                      + 0.5, 0, 255).astype(np.uint8)
        img = np.concatenate([lin, img[..., 3:]], axis=-1) if img.shape[-1] == 4 \
            else lin
    h, w, c = img.shape
    if c == 1:
        img = np.repeat(img, 3, axis=-1)
        c = 3
    if c == 3:
        img = np.concatenate(
            [img, np.full((h, w, 1), 255, np.uint8)], axis=-1)
    return img


def _mip_chain(img: np.ndarray) -> List[np.ndarray]:
    """Box-filtered mip chain (the reference's linear blit chain,
    VulkanResources.cpp:865-1003), down to 1x1, capped at MAX_MIPS."""
    mips = [img]
    while len(mips) < MAX_MIPS and max(mips[-1].shape[0], mips[-1].shape[1]) > 1:
        m = mips[-1].astype(np.float32)
        h, w = m.shape[:2]
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        m = m[: h2 * 2, : w2 * 2]
        if h > 1:
            m = (m[0::2] + m[1::2]) * 0.5
        if w > 1:
            m = (m[:, 0::2] + m[:, 1::2]) * 0.5
        mips.append((m + 0.5).astype(np.uint8))
    return mips


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TextureArrays:
    """Device-side atlas view."""

    pairs: jax.Array   # i32[H*W, 2] — (texel[x], texel[x+1]) RGBA8 words
    rects: jax.Array   # f32[T, MAX_MIPS, 4] — (x, y, w, h) per (tex, mip)
    mip_counts: jax.Array  # i32[T]
    width: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def count(self) -> int:
        return self.rects.shape[0]


class TextureAtlas:
    """Host-side shelf packer; rebuilds the device arrays when dirty."""

    def __init__(self, width: int = 1024):
        self.width = width
        self._shelves: List[Tuple[int, int, int]] = []  # (y, height, x_used)
        self._height = 0
        self._entries: List[List[Tuple[int, int, int, int]]] = []  # per tex: mip rects
        self._images: List[List[np.ndarray]] = []
        self._dirty = True
        self._device: Optional[TextureArrays] = None

    def _place(self, w: int, h: int) -> Tuple[int, int]:
        for i, (y, sh, x) in enumerate(self._shelves):
            if sh >= h and x + w <= self.width:
                self._shelves[i] = (y, sh, x + w)
                return x, y
        y = self._height
        self._shelves.append((y, h, w))
        self._height += h
        return 0, y

    def add(self, image: np.ndarray, srgb: bool = True) -> int:
        """Register a texture; returns its id. Builds + places its mip chain."""
        rgba = _to_rgba8(image, srgb)
        assert rgba.shape[1] <= self.width, "texture wider than the atlas"
        mips = _mip_chain(rgba)
        rects = []
        for m in mips:
            h, w = m.shape[:2]
            x, y = self._place(w, h)
            rects.append((x, y, w, h))
        tid = len(self._entries)
        self._entries.append(rects)
        self._images.append(mips)
        self._dirty = True
        return tid

    @property
    def count(self) -> int:
        return len(self._entries)

    def device_arrays(self) -> TextureArrays:
        if not self._dirty and self._device is not None:
            return self._device
        h = max(1, self._height)
        w = self.width
        atlas = np.zeros((h, w, 4), np.uint8)
        t = max(1, len(self._entries))
        rects = np.zeros((t, MAX_MIPS, 4), np.float32)
        mip_counts = np.ones((t,), np.int32)
        for tid, (mips, rlist) in enumerate(zip(self._images, self._entries)):
            mip_counts[tid] = len(mips)
            for lvl, (m, (x, y, mw, mh)) in enumerate(zip(mips, rlist)):
                atlas[y : y + mh, x : x + mw] = m
                rects[tid, lvl] = (x, y, mw, mh)
            for lvl in range(len(mips), MAX_MIPS):
                rects[tid, lvl] = rects[tid, len(mips) - 1]
        words = atlas.reshape(h, w, 4).view(np.uint32)[..., 0]  # RGBA8 LE words
        # x-adjacent pairs (clamped at the atlas edge): one gather = one tap row
        nxt = np.concatenate([words[:, 1:], words[:, -1:]], axis=1)
        pairs = np.stack([words, nxt], axis=-1).reshape(h * w, 2)
        self._device = TextureArrays(
            pairs=jnp.asarray(pairs.view(np.int32)),
            rects=jnp.asarray(rects),
            mip_counts=jnp.asarray(mip_counts),
            width=w,
        )
        self._dirty = False
        return self._device


def _decode_rgba(word: jax.Array) -> jax.Array:
    """i32 RGBA8 word -> f32[..., 4] in [0, 1]."""
    w = word
    return jnp.stack(
        [
            (w & 0xFF).astype(jnp.float32),
            ((w >> 8) & 0xFF).astype(jnp.float32),
            ((w >> 16) & 0xFF).astype(jnp.float32),
            ((w >> 24) & 0xFF).astype(jnp.float32),
        ],
        axis=-1,
    ) * (1.0 / 255.0)


def select_rows(table, ids: jax.Array, *, exact: bool = False) -> jax.Array:
    """table[ids] without per-element gathers: unrolled select accumulation
    for small tables (fully fused VPU work), packed row gathers beyond
    (ops.gather.gather_rows_packed — one fully-used 512 B physical row per
    element + halving subrow selects; exact for every dtype). The one-hot
    matmul this replaced was O(ids * n) and bf16-truncated at DEFAULT
    precision; ``exact`` is kept for API compatibility (the gather path is
    always exact). Tables wider than 128 gather row-per-element directly
    (each fetch is >= 1 physical row — nothing to pack)."""
    n = table.shape[0]
    if n <= 64:
        out = jnp.zeros(ids.shape + table.shape[1:], table.dtype)
        for i in range(n):
            sel = (ids == i).reshape(ids.shape + (1,) * (table.ndim - 1))
            out = jnp.where(sel, table[i], out)
        return out
    from ..ops.gather import gather_rows_packed

    idx = jnp.clip(ids, 0, n - 1)
    if table.ndim == 1:
        return gather_rows_packed(table[:, None], idx)[..., 0]
    if table.ndim == 2 and table.shape[1] <= 128:
        return gather_rows_packed(table, idx)
    return table[idx]


def _rect_lookup(tex: TextureArrays, tex_id: jax.Array, lod: jax.Array):
    """(x, y, w, h) of each sample's (texture, mip).

    Nested selects keep each select table at T rows (not T*MAX_MIPS, which
    crossed the 64-row matmul threshold at >8 textures and — at DEFAULT
    precision — rounded atlas offsets > 256 to the wrong texel): select the
    texture's whole [MAX_MIPS, 4] block by id (exact, offsets are addresses),
    then unroll the 8-way mip select."""
    t = tex.rects.shape[0]
    tid = jnp.clip(tex_id, 0, t - 1)
    mips = select_rows(
        tex.mip_counts.astype(jnp.float32)[:, None], tid)[..., 0]
    lvl = jnp.clip(lod.astype(jnp.int32), 0, mips.astype(jnp.int32) - 1)
    blocks = select_rows(
        tex.rects.reshape(t, MAX_MIPS * 4), tid, exact=True)
    rect = blocks[..., 0:4]
    for m in range(1, MAX_MIPS):
        rect = jnp.where((lvl == m)[..., None],
                         blocks[..., 4 * m : 4 * m + 4], rect)
    return rect


def _bilinear_tap(tex: TextureArrays, rect: jax.Array,
                  uv: jax.Array) -> jax.Array:
    """One bilinear tap inside a placement rect -> f32[..., 4] (two paired-
    texel row gathers; repeat wrap)."""
    rx, ry, rw, rh = rect[..., 0], rect[..., 1], rect[..., 2], rect[..., 3]

    u = uv[..., 0] - jnp.floor(uv[..., 0])   # repeat wrap
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    fx = u * rw - 0.5
    fy = v * rh - 0.5
    x0 = jnp.clip(jnp.floor(fx), 0.0, jnp.maximum(rw - 2.0, 0.0))
    y0 = jnp.clip(jnp.floor(fy), 0.0, jnp.maximum(rh - 1.0, 0.0))
    # rw == 1: the paired second texel belongs to an atlas neighbor — zero it
    ax = jnp.where(rw >= 2.0, jnp.clip(fx - x0, 0.0, 1.0), 0.0)[..., None]
    ay = jnp.clip(fy - y0, 0.0, 1.0)[..., None]
    y1 = jnp.minimum(y0 + 1.0, rh - 1.0)

    gx = (rx + x0).astype(jnp.int32)
    gy0 = (ry + y0).astype(jnp.int32)
    gy1 = (ry + y1).astype(jnp.int32)
    w = tex.width
    n = tex.pairs.shape[0]
    row0 = tex.pairs[jnp.clip(gy0 * w + gx, 0, n - 1)]   # [..., 2]
    row1 = tex.pairs[jnp.clip(gy1 * w + gx, 0, n - 1)]
    c00 = _decode_rgba(row0[..., 0])
    c10 = _decode_rgba(row0[..., 1])
    c01 = _decode_rgba(row1[..., 0])
    c11 = _decode_rgba(row1[..., 1])
    top = c00 * (1.0 - ax) + c10 * ax
    bot = c01 * (1.0 - ax) + c11 * ax
    return top * (1.0 - ay) + bot * ay


def sample_bilinear(
    tex: TextureArrays,
    tex_id: jax.Array,   # i32[...]; negative = no texture -> white
    uv: jax.Array,       # f32[..., 2]
    lod: Optional[jax.Array] = None,
) -> jax.Array:
    """Bilinear (nearest-mip) sample -> f32[..., 4] linear RGBA.

    Two row gathers per sample (paired texels); repeat wrap; the reference's
    combined image sampler analogue."""
    if lod is None:
        lod = jnp.zeros(tex_id.shape, jnp.float32)
    rect = _rect_lookup(tex, tex_id, lod)
    out = _bilinear_tap(tex, rect, uv)
    return jnp.where((tex_id >= 0)[..., None], out, 1.0)


def sample_trilinear(
    tex: TextureArrays,
    tex_id: jax.Array,   # i32[...]; negative = no texture -> white
    uv: jax.Array,       # f32[..., 2]
    lod: Optional[jax.Array] = None,
) -> jax.Array:
    """Trilinear sample -> f32[..., 4]: bilinear taps in the two adjacent
    mip levels lerped by the fractional lod (VK_SAMPLER_MIPMAP_MODE_LINEAR
    parity — the reference samplers request linear mipmap mode,
    src/PaperRenderer/VulkanResources.cpp:787-794). Removes the
    mip-boundary banding of the nearest-mip path at 2x its gather cost
    (four paired-texel row gathers per sample)."""
    if lod is None:
        return sample_bilinear(tex, tex_id, uv)
    l0 = jnp.floor(lod)
    frac = jnp.clip(lod - l0, 0.0, 1.0)[..., None]
    rect0 = _rect_lookup(tex, tex_id, l0)
    rect1 = _rect_lookup(tex, tex_id, l0 + 1.0)
    c0 = _bilinear_tap(tex, rect0, uv)
    c1 = _bilinear_tap(tex, rect1, uv)
    out = c0 * (1.0 - frac) + c1 * frac
    return jnp.where((tex_id >= 0)[..., None], out, 1.0)


def sample_aniso2(
    tex: TextureArrays,
    tex_id: jax.Array,   # i32[...]; negative = no texture -> white
    uv: jax.Array,       # f32[..., 2]
    lod: jax.Array,      # f32[...] — minor-axis lod (uv_screen_lod_aniso)
    duv_major: jax.Array,  # f32[..., 2] — major-axis uv derivative
) -> jax.Array:
    """2-tap anisotropic filter (the reference requests
    samplerAnisotropy when the device offers it,
    VulkanResources.cpp:787-794): two trilinear taps at +-1/4 of the
    major-axis footprint, each at the sharper minor-axis lod — oblique
    surfaces keep ~2x more detail along the major axis than isotropic
    trilinear, at 2x its cost."""
    off = duv_major * 0.25
    c0 = sample_trilinear(tex, tex_id, uv - off, lod)
    c1 = sample_trilinear(tex, tex_id, uv + off, lod)
    return (c0 + c1) * 0.5


def uv_screen_lod(uv: jax.Array, rw: jax.Array, rh: jax.Array) -> jax.Array:
    """Mip level from image-space uv derivatives: f32[H, W, 2] uv image +
    per-pixel texture extents -> f32[H, W]. The deferred-shading analogue of
    fragment-quad derivatives."""
    du_dx = jnp.abs(jnp.diff(uv, axis=1, append=uv[:, -1:]))
    du_dy = jnp.abs(jnp.diff(uv, axis=0, append=uv[-1:]))
    fx = jnp.maximum(du_dx[..., 0] * rw, du_dx[..., 1] * rh)
    fy = jnp.maximum(du_dy[..., 0] * rw, du_dy[..., 1] * rh)
    foot = jnp.maximum(jnp.maximum(fx, fy), 1e-8)
    return jnp.clip(jnp.log2(foot), 0.0, MAX_MIPS - 1.0)


def uv_screen_lod_aniso(uv: jax.Array, rw: jax.Array, rh: jax.Array,
                        max_aniso: float = 2.0):
    """Anisotropic sampling info from image-space uv derivatives.

    Returns ``(lod, duv_major)``: the lod of the MINOR footprint axis
    (clamped so the major/minor ratio <= ``max_aniso`` — footprint beyond
    the tap budget still mip-filters away) and the major-axis uv
    derivative for :func:`sample_aniso2`'s tap offsets."""
    duv_dx = jnp.diff(uv, axis=1, append=uv[:, -1:])
    duv_dy = jnp.diff(uv, axis=0, append=uv[-1:])
    fx = jnp.maximum(jnp.abs(duv_dx[..., 0]) * rw,
                     jnp.abs(duv_dx[..., 1]) * rh)
    fy = jnp.maximum(jnp.abs(duv_dy[..., 0]) * rw,
                     jnp.abs(duv_dy[..., 1]) * rh)
    major = jnp.maximum(jnp.maximum(fx, fy), 1e-8)
    minor = jnp.maximum(jnp.minimum(fx, fy), major / max_aniso)
    lod = jnp.clip(jnp.log2(minor), 0.0, MAX_MIPS - 1.0)
    duv_major = jnp.where((fx >= fy)[..., None], duv_dx, duv_dy)
    return lod, duv_major
