"""Sorted translucency: back-to-front blended pass over translucent instances.

Reference parity: RenderPass's "sorted" path (src/PaperRenderer/RenderPass.cpp
:560-709) CPU-sorts translucent instances by camera distance each frame,
computes their matrices on the CPU, and issues per-instance direct draws with
alpha blending (example pipeline state RenderPasses.cpp:383-394:
src_alpha/one_minus_src_alpha).

TPU-native re-design: no CPU work at all —
  * translucent triangles are identified by their material's shading model
    (SHADE_TRANSLUCENT) in the static expansion;
  * per-pixel we need the K nearest translucent fragments in depth order;
    K is small (default 4, like typical order-independent-transparency
    budgets). We run K depth-peeling passes of the same rasterizer: pass i
    finds the nearest fragment strictly behind pass i-1's depth. Deterministic
    and shape-static; cost is K raster passes over only-translucent triangles;
  * blending composites back-to-front over the opaque result with the
    reference's blend equation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.camera import CameraMatrices
from ..core.material import MaterialTable, SHADE_LEAF, SHADE_TRANSLUCENT
from .raster import TriangleBatch, rasterize, resolve_gbuffer_unproject
from .shading import Lights, leaf_alpha, shade_gbuffer


def non_opaque_mask(materials: MaterialTable, material_ids: jax.Array) -> jax.Array:
    """Triangles needing the sorted/cutout pass: BLEND translucency and
    alpha-cutout leaves (the reference's blended pipeline + any-hit cutout)."""
    sm = materials.shading_model[material_ids]
    return (sm == SHADE_TRANSLUCENT) | (sm == SHADE_LEAF)


def _rasterize_peel(
    batch: TriangleBatch,
    width: int,
    height: int,
    z_floor: jax.Array,  # f32[H, W] — only accept fragments with z > z_floor
    z_ceil: jax.Array,   # f32[H, W] — and z < z_ceil (the opaque depth)
    *,
    full_width: int | None = None,
    full_height: int | None = None,
    origin=(0, 0),
):
    """One depth-peeling layer using the XLA rasterizer with depth clamps.

    (A Pallas variant mirrors rasterize_tiles_binned; the translucent set is
    typically small so the XLA path is acceptable.)

    ``origin``/``full_*`` peel a screen-tile window of a larger viewport
    (sharded rendering): coefficients stay in full-viewport pixel space so
    edge tests match the single-device run exactly.
    """
    from .raster import triangle_coefficients

    fw = full_width or width
    fh = full_height or height
    x0, y0 = origin
    coeffs, ok, _ = triangle_coefficients(batch, fw, fh)
    t_cap = batch.capacity
    chunk = 128
    n_chunks = (t_cap + chunk - 1) // chunk
    pad = n_chunks * chunk - t_cap
    coeffs = jnp.pad(coeffs, ((0, pad), (0, 0), (0, 0)))
    if pad:
        coeffs = coeffs.at[t_cap:, :3, 2].set(-1.0)
    coeffs = coeffs.reshape(n_chunks, chunk, 5, 3)

    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5 + x0)[None, :]
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5 + y0)[:, None]
    px = jnp.broadcast_to(xs, (height, width)).reshape(-1)
    py = jnp.broadcast_to(ys, (height, width)).reshape(-1)
    pix = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)
    p = pix.shape[0]
    zf = z_floor.reshape(-1)
    zc = z_ceil.reshape(-1)

    zero = px * 0.0 + py * 0.0
    init = (zero + jnp.inf, zero.astype(jnp.int32) - 1,
            jnp.stack([zero, zero], axis=-1))

    def body(carry, inputs):
        depth, tid, bary = carry
        c, base = inputs
        cf = c.reshape(-1, 3)
        vals = (pix[:, 0:1] * cf[None, :, 0] + pix[:, 1:2] * cf[None, :, 1]
                + cf[None, :, 2]).reshape(p, chunk, 5)
        e = vals[..., :3]
        zn = vals[..., 3]
        wn = vals[..., 4]
        inside = jnp.all(e >= 0.0, axis=-1) & (wn > 1e-12) & (zn >= 0.0)
        z = jnp.where(inside, zn / jnp.where(inside, wn, 1.0), jnp.inf)
        # peeling window: strictly behind the previous layer, in front of opaque
        zok = (z > zf[:, None]) & (z < zc[:, None])
        z = jnp.where(zok, z, jnp.inf)
        best = jnp.argmin(z, axis=-1)
        best_z = jnp.min(z, axis=-1)
        win = best_z < depth
        best_e = jnp.take_along_axis(e, best[:, None, None], axis=1)[:, 0]
        esum = jnp.maximum(best_e.sum(axis=-1), 1e-30)
        depth = jnp.where(win, best_z, depth)
        tid = jnp.where(win, base + best.astype(jnp.int32), tid)
        bary = jnp.where(win[:, None], best_e[:, 1:3] / esum[:, None], bary)
        return (depth, tid, bary), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (depth, tid, bary), _ = jax.lax.scan(body, init, (coeffs, bases))
    return (depth.reshape(height, width), tid.reshape(height, width),
            bary.reshape(height, width, 2))


def composite_translucency(
    opaque_hdr: jax.Array,     # f32[H, W, 3]
    opaque_depth: jax.Array,   # f32[H, W]
    batch: TriangleBatch,      # the FULL triangle batch (all materials)
    materials: MaterialTable,
    lights: Lights,
    camera: CameraMatrices,
    *,
    layers: int = 4,
    use_exact: bool = False,
    pair_capacity: int = 0,
    textures=None,
    full_width: int | None = None,
    full_height: int | None = None,
    origin=(0, 0),
) -> Tuple[jax.Array, jax.Array]:
    """Depth-peel the translucent triangles and blend back-to-front over the
    opaque HDR image (the sorted-instance path, RenderPass.cpp:560-709).

    ``use_exact`` peels with the binned Pallas depth-key kernel (each layer
    windows fragments to (previous layer, opaque depth) keys); otherwise the
    pure-XLA rasterizer peels with explicit depth clamps.

    Returns (hdr f32[H, W, 3], required i32 scalar): ``required`` is the max
    pair-slot demand across peel layers (0 on the XLA path), so callers fold
    it into the same overflow-growth protocol as the opaque pass —
    translucent-heavy scenes must grow work capacity too.

    ``origin``/``full_*`` composite a screen-tile window of a larger
    viewport (sharded rendering)."""
    h, w = opaque_depth.shape
    translucent = non_opaque_mask(materials, batch.material)
    tbatch = TriangleBatch(
        clip=batch.clip,
        world=batch.world,
        normal=batch.normal,
        uv=batch.uv,
        material=batch.material,
        valid=batch.valid & translucent,
        cull=batch.cull,   # leaf/translucent materials default CULL_NONE
    )

    # collect up to `layers` nearest fragments per pixel (front-to-back)
    peels = []
    required = jnp.int32(0)
    if use_exact:
        from .raster_exact import (
            depth_to_key, rasterize_exact, resolve_gbuffer_pairs,
        )

        floor = jnp.full((h, w), jnp.iinfo(jnp.int32).min + 1, jnp.int32)
        ceil = depth_to_key(opaque_depth)
        for li in range(layers):
            # the first layer carries the in-graph overflow fallback (all
            # layers bin the same translucent set, so one guarded layer
            # bounds them all); every layer's demand feeds `required`
            depth, tid, attr_pairs, req = rasterize_exact(
                tbatch, w, h, pair_capacity=pair_capacity or None,
                overflow_cond=(li == 0), depth_window=(floor, ceil),
                full_width=full_width, full_height=full_height, origin=origin,
            )
            required = jnp.maximum(required, req)
            peels.append(resolve_gbuffer_pairs(
                attr_pairs, depth, tid, camera,
                full_width=full_width, full_height=full_height, origin=origin))
            floor = depth_to_key(depth)
    else:
        z_floor = jnp.full((h, w), -jnp.inf, jnp.float32)
        for _ in range(layers):
            depth, tid, bary = _rasterize_peel(
                tbatch, w, h, z_floor, opaque_depth,
                full_width=full_width, full_height=full_height, origin=origin)
            peels.append(resolve_gbuffer_unproject(
                tbatch, depth, tid, bary, camera,
                full_width=full_width, full_height=full_height, origin=origin))
            z_floor = jnp.where(jnp.isfinite(depth), depth, z_floor)

    # shade each layer, then blend BACK-to-front: dst = src*a + dst*(1-a)
    from ..core.texture import select_rows

    out = opaque_hdr
    for gbuf in reversed(peels):
        color = shade_gbuffer(gbuf, materials, lights, camera.cam_pos,
                              textures=textures)
        alpha = select_rows(materials.alpha, gbuf.material)
        sm = select_rows(materials.shading_model, gbuf.material)
        # leaf cutout: binary alpha from the procedural pattern at the hit UV
        is_leaf = sm == SHADE_LEAF
        alpha = jnp.where(is_leaf, leaf_alpha(gbuf.uv), alpha)
        a = jnp.where(gbuf.coverage, alpha, 0.0)[..., None]
        out = color * a + out * (1.0 - a)
    return out, required
