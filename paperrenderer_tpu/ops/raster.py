"""Rasterization: triangle batch build, rasterize, G-buffer resolve.

The reference rasterizes via hardware ``vkCmdDrawIndexedIndirect`` fed by the
GPU-driven preprocess (src/PaperRenderer/IndirectDraw.cpp:207-242). A TPU has
no triangle hardware, so rasterization is re-designed as three data-parallel
stages, all shape-static and fused under jit:

  1. ``build_triangle_batch`` — expand the compacted draw list into a flat
     triangle SoA of static capacity, transform to clip space (one matmul),
     and precompute screen-space edge/interpolation coefficients.
  2. ``rasterize`` — for every pixel, find the nearest covering triangle.
     Coverage/depth for a (pixel-block x triangle-chunk) pair is a small
     matmul: [P, 3] pixel coords x [3, 4C] coefficients -> edge values + depth.
     The depth test is a running min over chunks (a scan), replacing the
     hardware ROP. A Pallas tile kernel (ops/raster_pallas.py) implements the
     same contract with VMEM-resident chunking + binning; this module's pure
     XLA version is the reference implementation and the CPU/test path.
  3. ``resolve_gbuffer`` — gather vertex attributes for the winning triangle,
     perspective-correct interpolate (the fragment-shader input block of
     example Default.vert/frag).

Fill convention: a pixel is covered when all three (CCW, y-down screen) edge
functions are >= 0; ties on shared edges follow a top-left-style bias applied
by nudging sample positions by half a pixel (pixel centers).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.camera import CameraMatrices
from ..core.geometry import GeometryArrays
from .preprocess import PreprocessResult

NO_HIT = jnp.int32(-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriangleBatch:
    """Flat clip-space triangle SoA of static capacity T."""

    clip: jax.Array         # f32[T, 3, 4] — clip-space positions
    world: jax.Array        # f32[T, 3, 3] — world-space positions
    normal: jax.Array       # f32[T, 3, 3] — world-space vertex normals
    uv: jax.Array           # f32[T, 3, 2]
    material: jax.Array     # i32[T] — resolved material id
    valid: jax.Array        # bool[T]
    # bool[T] — reject back-facing screen triangles (the pipeline's
    # VK_CULL_MODE_BACK_BIT state, Pipeline.h:80); None = render two-sided.
    # Set per-triangle from the material table via ``attach_cull``.
    cull: "jax.Array | None" = None

    @property
    def capacity(self) -> int:
        return self.clip.shape[0]


def attach_cull(batch: TriangleBatch, materials) -> TriangleBatch:
    """Resolve per-material cull modes into the batch's per-triangle ``cull``
    flags (MaterialTable.cull_back indexed by the batch's material ids —
    unrolled selects, not a gather; the table is small)."""
    from ..core.texture import select_rows

    return dataclasses.replace(
        batch, cull=select_rows(materials.cull_back, batch.material))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GBuffer:
    """Per-pixel geometry attributes, input to deferred shading."""

    depth: jax.Array     # f32[H, W] — NDC depth, +inf where empty
    tri_id: jax.Array    # i32[H, W] — triangle row, -1 where empty
    world_pos: jax.Array  # f32[H, W, 3]
    normal: jax.Array     # f32[H, W, 3]
    uv: jax.Array         # f32[H, W, 2]
    material: jax.Array   # i32[H, W]

    @property
    def coverage(self) -> jax.Array:
        return self.tri_id >= 0


def _row_for_triangle(tri_counts: jax.Array, capacity: int) -> Tuple[jax.Array, jax.Array]:
    """Map a flat triangle index -> (draw row, index within row).

    Deterministic expansion of variable-length rows into a static batch:
    searchsorted over the exclusive cumsum (the scan+gather replacement for
    a GPU's per-thread append).
    """
    ends = jnp.cumsum(tri_counts)                       # inclusive
    starts = ends - tri_counts
    t = jnp.arange(capacity, dtype=jnp.int32)
    row = jnp.searchsorted(ends, t, side="right").astype(jnp.int32)
    row_c = jnp.minimum(row, tri_counts.shape[0] - 1)
    within = t - starts[row_c]
    return row_c, within


def build_triangle_batch(
    pre: PreprocessResult,
    geo: GeometryArrays,
    camera: CameraMatrices,
    *,
    capacity: int,
) -> TriangleBatch:
    """Expand draw rows into a clip-space triangle SoA (static capacity)."""
    row, within = _row_for_triangle(pre.draw_tri_count, capacity)
    valid = jnp.arange(capacity, dtype=jnp.int32) < pre.total_tris

    inst = jnp.maximum(pre.draw_instance[row], 0)
    tri_idx = pre.draw_tri_offset[row] + within
    tri_idx = jnp.where(valid, tri_idx, 0)

    vidx = geo.indices[tri_idx]                     # i32[T, 3]
    v_obj = geo.positions[vidx]                     # f32[T, 3, 3]
    n_obj = geo.normals[vidx]
    uv = geo.uvs[vidx]

    m = pre.matrices[inst]                          # f32[T, 3, 4]
    world = jnp.einsum("tij,tkj->tki", m[:, :, :3], v_obj) + m[:, None, :, 3]
    # normals: rotate (uniform-scale assumption matches the reference shaders,
    # example Default.vert applies the same matrix to normals)
    a = m[:, :, :3]
    n_world = jnp.einsum("tij,tkj->tki", a, n_obj)
    n_world = n_world / jnp.maximum(
        jnp.linalg.norm(n_world, axis=-1, keepdims=True), 1e-12
    )

    vp = camera.view_proj                           # f32[4, 4]
    world_h = jnp.concatenate([world, jnp.ones_like(world[..., :1])], axis=-1)
    clip = jnp.einsum("ij,tkj->tki", vp, world_h)   # the vertex-transform matmul

    material = jnp.where(valid, pre.draw_material[row], 0)
    return TriangleBatch(
        clip=clip, world=world, normal=n_world, uv=uv,
        material=material, valid=valid,
    )


def triangle_coefficients(batch: TriangleBatch, width: int, height: int):
    """Per-triangle setup for *clipless homogeneous* rasterization.

    Instead of clipping against the near plane (branchy, shape-hostile — the
    reference leans on hardware clipping), we rasterize directly in 2D
    homogeneous space (Olano-Greer): with the 3x3 matrix M whose columns are
    the vertices' (x_pix*w, y_pix*w, w), the adjugate rows e_i = cross of the
    other two columns give edge functions b_i(p) = e_i . (px, py, 1) that are
    all >= 0 (after orienting by sign(det)) exactly for pixels covered by the
    *front-facing part* of the triangle — including triangles that cross the
    w=0 plane. Normalized b are perspective-correct barycentrics, so attribute
    interpolation needs no 1/w correction.

    Returns coeffs f32[T, 5, 3] packing (e0, e1, e2, z_num, w_num): per pixel
      b_i = e_i . p;  inside = all b_i >= 0  and  (w_num . p) > 0
      depth = (z_num . p) / (w_num . p)       (NDC depth)
    plus a validity mask and conservative pixel-space AABBs for binning
    (triangles crossing w<=0 get a full-screen AABB).
    """
    clip = batch.clip                                   # f32[T, 3, 4]
    w = clip[..., 3]
    # Fold the viewport transform into homogeneous coords. Row 0 = image top =
    # camera up (GL-style NDC, y flipped into raster order). The reference
    # feeds GLM matrices to an unflipped Vulkan viewport, so its framebuffer
    # is the vertical mirror of ours — flip before any pixel comparison.
    xh = (clip[..., 0] * 0.5 + w * 0.5) * width         # = x_pix * w
    yh = (w * 0.5 - clip[..., 1] * 0.5) * height
    v = jnp.stack([xh, yh, w], axis=-1)                 # f32[T, 3(vert), 3]

    def edge_row(p, q):
        """cross(p, q) computed in a canonical vertex order.

        Adjacent triangles share edges with opposite orientation; water-
        tightness requires their edge rows to be EXACT negations. Plain
        cross(p,q) vs cross(q,p) is not exactly antisymmetric once XLA
        fuses multiply-subtract into FMAs, so order the operands
        canonically (lexicographic) and flip the sign afterwards — sign
        flips are exact, so both triangles agree bit-for-bit.
        """
        swap = (
            (q[:, 0] < p[:, 0])
            | ((q[:, 0] == p[:, 0]) & (q[:, 1] < p[:, 1]))
            | ((q[:, 0] == p[:, 0]) & (q[:, 1] == p[:, 1]) & (q[:, 2] < p[:, 2]))
        )[:, None]
        a = jnp.where(swap, q, p)
        b = jnp.where(swap, p, q)
        row = jnp.cross(a, b)
        return jnp.where(swap, -row, row)

    e0 = edge_row(v[:, 1], v[:, 2])
    e1 = edge_row(v[:, 2], v[:, 0])
    e2 = edge_row(v[:, 0], v[:, 1])
    det = jnp.sum(v[:, 0] * e0, axis=-1)

    ok = batch.valid & (jnp.abs(det) > 1e-14)
    if batch.cull is not None:
        # Back-face culling (VK_CULL_MODE_BACK_BIT + VK_FRONT_FACE_CLOCKWISE,
        # Pipeline.h:80-81). The reference renders with an unflipped viewport
        # (its framebuffer is our vertical mirror — see the yh comment above),
        # so its clockwise front face is counter-clockwise here: det < 0.
        # Verified empirically: >99.98% of depth-winning pixels on the closed
        # example meshes come from det < 0 triangles. Rejecting here (before
        # edge orientation AND before AABB binning) removes back faces from
        # every raster path and from the pair-demand probes alike.
        ok &= ~(batch.cull & (det > 0))
    # Orient by sign(det) ONLY (an exact sign-bit flip): shared edges of
    # adjacent triangles then evaluate as exact IEEE negations of each other,
    # which makes the mesh watertight (one side's test always passes).
    # Do NOT scale by 1/det — per-triangle scales differ, breaking the exact
    # negation and opening single-pixel seams along shared edges. Raw
    # adjugate magnitudes are safe with the broadcast-FMA evaluation the
    # rasterizers use (the earlier precision failure was bf16 GEMM paths);
    # downstream math (bary, z) is scale-invariant in these rows.
    s = jnp.where(det < 0, -1.0, 1.0)[:, None]
    e0, e1, e2 = e0 * s, e1 * s, e2 * s

    z = clip[..., 2]
    z_num = z[:, 0, None] * e0 + z[:, 1, None] * e1 + z[:, 2, None] * e2
    w_num = w[:, 0, None] * e0 + w[:, 1, None] * e1 + w[:, 2, None] * e2

    # Normalize the DEPTH rows (only) per triangle by a shared power of two:
    # the zn/wn ratio, the zn >= 0 clip, and cross-triangle ordering are all
    # invariant under a positive per-triangle scale (and powers of two are
    # exact), but the raw adjugate magnitudes (~pix^2 * w^3) reach ~7e13 at
    # 1080p on a 2000-unit scene — the crossz kernel's cross-multiplied
    # compare (zn_a * wn_b) would overflow f32 on km-scale worlds. Edge rows
    # stay untouched (per-triangle scaling there breaks watertightness).
    m = jnp.maximum(jnp.max(jnp.abs(z_num), axis=-1),
                    jnp.max(jnp.abs(w_num), axis=-1))
    m = jnp.maximum(m, jnp.float32(1e-30))
    mexp = (jax.lax.bitcast_convert_type(m, jnp.int32) >> 23) & 0xFF
    scale = jax.lax.bitcast_convert_type(
        jnp.clip(254 - mexp, 1, 254) << 23, jnp.float32)[:, None]
    z_num = z_num * scale
    w_num = w_num * scale

    coeffs = jnp.stack([e0, e1, e2, z_num, w_num], axis=1)  # f32[T, 5, 3]
    never = jnp.zeros((5, 3), jnp.float32).at[:3, 2].set(-1.0)
    coeffs = jnp.where(ok[:, None, None], coeffs, never)

    # conservative screen AABBs for binning: exact when all w > eps,
    # full-screen for near-plane-crossing triangles
    safe_w = jnp.maximum(w, 1e-6)
    px = xh / safe_w
    py = yh / safe_w
    unbounded = jnp.any(w <= 1e-6, axis=-1)
    full_lo = jnp.zeros((), jnp.float32)
    aabb_lo = jnp.stack(
        [
            jnp.where(unbounded, full_lo, px.min(axis=-1)),
            jnp.where(unbounded, full_lo, py.min(axis=-1)),
        ],
        axis=-1,
    )
    aabb_hi = jnp.stack(
        [
            jnp.where(unbounded, jnp.float32(width), px.max(axis=-1)),
            jnp.where(unbounded, jnp.float32(height), py.max(axis=-1)),
        ],
        axis=-1,
    )
    return coeffs, ok, (aabb_lo, aabb_hi)


def rasterize(
    batch: TriangleBatch,
    width: int,
    height: int,
    *,
    chunk: int = 128,
    full_width: int | None = None,
    full_height: int | None = None,
    origin: Tuple[jax.Array, jax.Array] = (0, 0),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pure-XLA rasterizer: nearest covering triangle per pixel.

    Returns (depth f32[H, W], tri_id i32[H, W], bary f32[H, W, 2]) where bary
    holds *perspective-correct* barycentrics (a1, a2); a0 = 1 - a1 - a2.

    For screen-tile sharding, render a (width x height) window of a larger
    (full_width x full_height) viewport at pixel offset ``origin=(x0, y0)`` —
    each device rasterizes its own window against the replicated batch.
    """
    fw = full_width or width
    fh = full_height or height
    coeffs, ok, _aabb = triangle_coefficients(batch, fw, fh)
    t_cap = batch.capacity
    n_chunks = (t_cap + chunk - 1) // chunk
    pad = n_chunks * chunk - t_cap
    coeffs = jnp.pad(coeffs, ((0, pad), (0, 0), (0, 0)),
                     constant_values=0.0)
    if pad:
        # padded rows: never cover
        coeffs = coeffs.at[t_cap:, :3, 2].set(-1.0)
    coeffs = coeffs.reshape(n_chunks, chunk, 5, 3)

    x0, y0 = origin
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5 + x0)[None, :]
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5 + y0)[:, None]
    px = jnp.broadcast_to(xs, (height, width)).reshape(-1)
    py = jnp.broadcast_to(ys, (height, width)).reshape(-1)
    pix = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)       # f32[P, 3]

    p = pix.shape[0]
    # Derive the carry init from pix so its device-varying type matches the
    # body outputs under shard_map (origin depends on axis_index there).
    zero = px * 0.0 + py * 0.0  # varying on every axis either coord varies on
    init = (
        zero + jnp.inf,                          # depth
        zero.astype(jnp.int32) - 1,              # tri id
        jnp.stack([zero, zero], axis=-1),        # bary (b1, b2)
    )

    def body(carry, inputs):
        depth, tid, bary = carry
        c, chunk_base = inputs                                   # c: [C, 5, 3]
        # Evaluate the 5 affine functions per (pixel, triangle) with explicit
        # broadcast FMA on the VPU. Deliberately NOT a matmul: GEMM paths
        # (bf16-truncated MXU on TPU, fast CPU kernels) lose precision the
        # edge test can't afford, and K=3 wastes the systolic array anyway.
        cf = c.reshape(-1, 3)                                    # [5C, 3]
        vals = (
            pix[:, 0:1] * cf[None, :, 0]
            + pix[:, 1:2] * cf[None, :, 1]
            + cf[None, :, 2]
        )
        vals = vals.reshape(p, chunk, 5)
        e = vals[..., :3]
        z_num = vals[..., 3]
        w_num = vals[..., 4]
        # z_num >= 0 clips fragments in front of the near plane (Vulkan
        # clip-volume semantics: 0 <= z <= w)
        inside = jnp.all(e >= 0.0, axis=-1) & (w_num > 1e-12) & (z_num >= 0.0)
        z = jnp.where(inside, z_num / jnp.where(inside, w_num, 1.0), jnp.inf)
        best = jnp.argmin(z, axis=-1)                            # [P]
        best_z = jnp.take_along_axis(z, best[:, None], axis=1)[:, 0]
        win = best_z < depth
        best_e = jnp.take_along_axis(e, best[:, None, None], axis=1)[:, 0]
        esum = jnp.maximum(best_e.sum(axis=-1), 1e-30)
        depth = jnp.where(win, best_z, depth)
        tid = jnp.where(win, chunk_base + best.astype(jnp.int32), tid)
        bary = jnp.where(win[:, None], best_e[:, 1:3] / esum[:, None], bary)
        return (depth, tid, bary), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (depth, tid, bary), _ = jax.lax.scan(body, init, (coeffs, bases))
    return (
        depth.reshape(height, width),
        tid.reshape(height, width),
        bary.reshape(height, width, 2),
    )


def pack_attributes(batch: TriangleBatch) -> jax.Array:
    """Pack per-triangle hit attributes into single rows f32[T, 16]:
    (n0,n1,n2 | uv0,uv1,uv2 | material) — so G-buffer resolve costs ONE
    row gather per pixel (TPU gathers are latency-bound per row)."""
    t = batch.capacity
    return jnp.concatenate(
        [
            batch.normal.reshape(t, 9),
            batch.uv.reshape(t, 6),
            batch.material.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )


def resolve_gbuffer_packed(
    attr: jax.Array,      # f32[T, 16] from pack_attributes
    depth: jax.Array,
    tri_id: jax.Array,
    bary: jax.Array,
    camera,
    *,
    full_width: int | None = None,
    full_height: int | None = None,
    origin=(0, 0),
) -> GBuffer:
    """resolve_gbuffer_unproject with one packed attribute gather per pixel.

    ``origin``/``full_*`` resolve a screen-tile window (sharded rendering)."""
    h, w = depth.shape
    fw = full_width or w
    fh = full_height or h
    x0, y0 = origin
    tid = jnp.maximum(tri_id, 0)
    covered = tri_id >= 0

    inv_vp = jnp.linalg.inv(camera.view_proj)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5 + x0) / fw * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5 + y0) / fh * 2.0
    ndc_x = jnp.broadcast_to(xs[None, :], (h, w))
    ndc_y = jnp.broadcast_to(ys[:, None], (h, w))
    z = jnp.where(covered, depth, 0.0)
    cols = [
        inv_vp[i, 0] * ndc_x + inv_vp[i, 1] * ndc_y + inv_vp[i, 2] * z + inv_vp[i, 3]
        for i in range(4)
    ]
    inv_w = 1.0 / jnp.where(jnp.abs(cols[3]) < 1e-12, 1e-12, cols[3])
    world = jnp.stack([cols[0] * inv_w, cols[1] * inv_w, cols[2] * inv_w], axis=-1)

    rows = attr[tid]                                      # [H, W, 16] one gather
    b1 = bary[..., 0]
    b2 = bary[..., 1]
    b0 = 1.0 - b1 - b2
    n = (
        b0[..., None] * rows[..., 0:3]
        + b1[..., None] * rows[..., 3:6]
        + b2[..., None] * rows[..., 6:9]
    )
    normal = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    uv = (
        b0[..., None] * rows[..., 9:11]
        + b1[..., None] * rows[..., 11:13]
        + b2[..., None] * rows[..., 13:15]
    )
    material = jnp.where(covered, rows[..., 15].astype(jnp.int32), 0)
    return GBuffer(
        depth=depth,
        tri_id=tri_id,
        world_pos=jnp.where(covered[..., None], world, 0.0),
        normal=jnp.where(covered[..., None], normal, 0.0),
        uv=jnp.where(covered[..., None], uv, 0.0),
        material=material,
    )


def resolve_gbuffer_unproject(
    batch: TriangleBatch,
    depth: jax.Array,
    tri_id: jax.Array,
    bary: jax.Array,
    camera,
    *,
    full_width: int | None = None,
    full_height: int | None = None,
    origin=(0, 0),
) -> GBuffer:
    """Like resolve_gbuffer but reconstructs world positions by unprojecting
    (pixel, depth) through inverse(view_proj) instead of gathering and
    interpolating vertex positions — per-pixel row gathers are the slowest
    op on TPU, and depth already encodes the position exactly.

    ``origin``/``full_*`` resolve a screen-tile window (sharded rendering)."""
    h, w = depth.shape
    fw = full_width or w
    fh = full_height or h
    x0, y0 = origin
    tid = jnp.maximum(tri_id, 0)
    covered = tri_id >= 0

    inv_vp = jnp.linalg.inv(camera.view_proj)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5 + x0) / fw * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5 + y0) / fh * 2.0
    ndc_x = jnp.broadcast_to(xs[None, :], (h, w))
    ndc_y = jnp.broadcast_to(ys[:, None], (h, w))
    z = jnp.where(covered, depth, 0.0)
    # world_h = inv_vp @ (x, y, z, 1); world = xyz / w  (dense, no gathers)
    cols = [
        inv_vp[i, 0] * ndc_x + inv_vp[i, 1] * ndc_y + inv_vp[i, 2] * z + inv_vp[i, 3]
        for i in range(4)
    ]
    inv_w = 1.0 / jnp.where(jnp.abs(cols[3]) < 1e-12, 1e-12, cols[3])
    world = jnp.stack([cols[0] * inv_w, cols[1] * inv_w, cols[2] * inv_w], axis=-1)

    b1 = bary[..., 0]
    b2 = bary[..., 1]
    pw = jnp.stack([1.0 - b1 - b2, b1, b2], axis=-1)
    normal = jnp.einsum("hwk,hwkc->hwc", pw, batch.normal[tid])
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
    uv = jnp.einsum("hwk,hwkc->hwc", pw, batch.uv[tid])
    material = jnp.where(covered, batch.material[tid], 0)
    return GBuffer(
        depth=depth,
        tri_id=tri_id,
        world_pos=jnp.where(covered[..., None], world, 0.0),
        normal=jnp.where(covered[..., None], normal, 0.0),
        uv=jnp.where(covered[..., None], uv, 0.0),
        material=material,
    )


def resolve_gbuffer(
    batch: TriangleBatch,
    depth: jax.Array,
    tri_id: jax.Array,
    bary: jax.Array,
) -> GBuffer:
    """Gather winning-triangle attributes and interpolate.

    The rasterizer's barycentrics are already perspective-correct (homogeneous
    rasterization), so interpolation is a plain weighted sum.
    """
    tid = jnp.maximum(tri_id, 0)
    covered = tri_id >= 0

    b1 = bary[..., 0]
    b2 = bary[..., 1]
    b0 = 1.0 - b1 - b2
    pw = jnp.stack([b0, b1, b2], axis=-1)                        # [H, W, 3]

    world = jnp.einsum("hwk,hwkc->hwc", pw, batch.world[tid])
    normal = jnp.einsum("hwk,hwkc->hwc", pw, batch.normal[tid])
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
    uv = jnp.einsum("hwk,hwkc->hwc", pw, batch.uv[tid])

    material = jnp.where(covered, batch.material[tid], 0)
    return GBuffer(
        depth=depth,
        tri_id=tri_id,
        world_pos=jnp.where(covered[..., None], world, 0.0),
        normal=jnp.where(covered[..., None], normal, 0.0),
        uv=jnp.where(covered[..., None], uv, 0.0),
        material=material,
    )
