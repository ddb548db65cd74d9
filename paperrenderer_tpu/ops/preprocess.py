"""Instance preprocess: transform + frustum cull + LOD select + draw build.

TPU-native re-design of the reference's GPU-driven preprocess compute pass
(resources/shaders/IndirectDrawBuild.comp, math in Common.glsl:79-188):

  reference (per-thread, divergent):            here (whole-buffer, fused):
    getModelMatrix per instance            ->     trs_to_mat34 over the SoA
    isInBounds view-space AABB cull        ->     same math, vectorized
    getLODLevel                            ->     same formula, vectorized
    atomicAdd(drawCmd.instanceCount) +     ->     visibility mask + prefix-sum
      scattered matrix write                      compaction (deterministic)

The "indirect draw" output becomes a *draw list*: for every (instance, mesh of
chosen LOD) pair, a compact row of {tri_offset, tri_count, instance_id,
material_id}. Downstream the rasterizer expands rows into a static-capacity
triangle batch. Per-mesh-group instance counts (the DrawCommand analogue) fall
out of a segment-sum and are used for stats/tests.

Everything is shape-static: the draw list has capacity
``instance_capacity * max_meshes_per_lod``; dead rows carry count 0.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.camera import CameraMatrices
from ..core.scene import InstanceArrays, SceneTables
from ..core.transforms import trs_to_mat34


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreprocessResult:
    """Per-frame device outputs of the preprocess pass."""

    matrices: jax.Array      # f32[N, 3, 4] — model matrices (all instances)
    visible: jax.Array       # bool[N]      — post-cull visibility
    lod: jax.Array           # i32[N]       — selected LOD per instance
    # Compacted draw list (capacity D = N * max_meshes_per_lod):
    draw_instance: jax.Array  # i32[D] — instance id, -1 past draw_count
    draw_mesh: jax.Array      # i32[D] — mesh-table row
    draw_slot: jax.Array      # i32[D] — material slot of the mesh
    draw_material: jax.Array  # i32[D] — resolved material id (per-pass binding)
    draw_tri_offset: jax.Array  # i32[D]
    draw_tri_count: jax.Array   # i32[D]
    draw_count: jax.Array       # i32[]  — live rows
    total_tris: jax.Array       # i32[]  — sum of draw_tri_count (batch sizing)


def frustum_cull(
    aabb_min: jax.Array,      # f32[N, 3] object-space AABB min
    aabb_max: jax.Array,      # f32[N, 3]
    matrices: jax.Array,      # f32[N, 3, 4]
    camera: CameraMatrices,
) -> jax.Array:
    """View-space AABB frustum test, reproducing Common.glsl:119-168.

    The reference transforms the 8 box corners to *view* space, builds a
    view-space AABB, and tests it against planes derived from the projection
    matrix. Same math here, vectorized over all instances at once.
    """
    n = matrices.shape[0]
    # 8 object-space corners [8, 3] -> world -> view
    sel = jnp.asarray(
        [[1, 1, 1], [1, 1, 0], [0, 1, 1], [1, 0, 1],
         [1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]],
        jnp.float32,
    )
    corners = (
        sel[None] * aabb_max[:, None, :] + (1.0 - sel[None]) * aabb_min[:, None, :]
    )  # [N, 8, 3]
    world = (
        jnp.einsum("nij,nkj->nki", matrices[:, :, :3], corners)
        + matrices[:, None, :, 3]
    )
    view = camera.view
    vs = jnp.einsum("ij,nkj->nki", view[:3, :3], world) + view[None, None, :3, 3]
    lo = vs.min(axis=1)  # [N, 3] view-space AABB
    hi = vs.max(axis=1)

    # Frustum planes from the projection matrix rows (Common.glsl:155-157).
    proj = camera.projection
    fx = proj[3] + proj[0]
    fx = fx / jnp.linalg.norm(fx[:3])
    fy = proj[3] + proj[1]
    fy = fy / jnp.linalg.norm(fy[:3])

    visible = lo[:, 2] < 0.0  # everything fully behind the camera is culled
    kx = fx[2] / fx[0]
    visible &= ~((hi[:, 0] < kx * -lo[:, 2]) | (lo[:, 0] > kx * lo[:, 2]))
    ky = fy[1]
    visible &= ~((hi[:, 1] < ky * lo[:, 2]) | (lo[:, 1] > ky * -lo[:, 2]))
    return visible


def select_lod(
    pos: jax.Array,        # f32[N, 3] instance positions
    aabb_min: jax.Array,   # f32[N, 3]
    aabb_max: jax.Array,
    lod_count: jax.Array,  # i32[N]
    cam_pos: jax.Array,    # f32[3]
) -> jax.Array:
    """LOD level = floor(invsqrt(worldSize*10) * sqrt(camDist)), clamped —
    Common.glsl:170-188 + the min() at IndirectDrawBuild.comp:121."""
    size = jnp.max(aabb_max - aabb_min, axis=-1)
    dist = jnp.linalg.norm(pos - cam_pos[None], axis=-1)
    raw = jnp.floor(jax.lax.rsqrt(jnp.maximum(size * 10.0, 1e-12)) * jnp.sqrt(dist))
    raw = jnp.nan_to_num(raw, nan=0.0, posinf=1e9).astype(jnp.int32)
    return jnp.clip(raw, 0, jnp.maximum(lod_count - 1, 0))


def preprocess_instances(
    instances: InstanceArrays,
    tables: SceneTables,
    camera: CameraMatrices,
    *,
    max_meshes_per_lod: int,
    do_culling: bool = True,
    instance_visible: Optional[jax.Array] = None,  # bool[N] user flag
    slot_materials: Optional[jax.Array] = None,    # i32[N, S] slot -> material id
    lod_override: Optional[int] = None,            # force an LOD (RT uses LOD 0,
                                                   # like reference BLAS geometry)
) -> PreprocessResult:
    """The full preprocess pass as one fused, jittable function.

    Replaces RasterPreprocessPipeline::submit + IndirectDrawBuild.comp.
    """
    n = instances.capacity
    model_id = jnp.maximum(instances.model_id, 0)  # safe gather for dead rows
    alive = instances.alive

    matrices = trs_to_mat34(instances.pos, instances.scale, instances.quat)

    aabb_min = tables.model_aabb_min[model_id]
    aabb_max = tables.model_aabb_max[model_id]
    lod_count = tables.model_lod_count[model_id]

    visible = alive
    if instance_visible is not None:
        visible &= instance_visible
    if do_culling:
        visible &= frustum_cull(aabb_min, aabb_max, matrices, camera)

    if lod_override is None:
        lod = select_lod(instances.pos, aabb_min, aabb_max, lod_count, camera.cam_pos)
    else:
        lod = jnp.minimum(
            jnp.full_like(lod_count, lod_override), jnp.maximum(lod_count - 1, 0)
        )

    # Resolve chosen LOD -> mesh rows. Static bound: max_meshes_per_lod.
    lod_row = tables.model_lod_offset[model_id] + lod           # i32[N]
    mesh_off = tables.lod_mesh_offset[lod_row]                  # i32[N]
    mesh_cnt = tables.lod_mesh_count[lod_row]                   # i32[N]

    k = max_meshes_per_lod
    mesh_idx = mesh_off[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]  # [N, K]
    pair_valid = visible[:, None] & (
        jnp.arange(k, dtype=jnp.int32)[None, :] < mesh_cnt[:, None]
    )
    mesh_idx = jnp.where(pair_valid, mesh_idx, 0)

    # --- prefix-sum compaction (the atomicAdd replacement) ------------------
    flat_valid = pair_valid.reshape(-1)                          # [N*K]
    flat_mesh = mesh_idx.reshape(-1)
    flat_inst = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, k)
    ).reshape(-1)

    slot_pos = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1      # write index
    draw_count = jnp.where(flat_valid.size > 0, slot_pos[-1] + 1, 0).astype(jnp.int32)
    d = flat_valid.size
    write_idx = jnp.where(flat_valid, slot_pos, d)               # d = dropped

    draw_instance = jnp.full((d,), -1, jnp.int32).at[write_idx].set(
        flat_inst, mode="drop"
    )
    draw_mesh = jnp.zeros((d,), jnp.int32).at[write_idx].set(flat_mesh, mode="drop")
    draw_slot = tables.mesh_slot[draw_mesh]
    tri_off = tables.mesh_tri_offset[draw_mesh]
    tri_cnt = tables.mesh_tri_count[draw_mesh]
    live = draw_instance >= 0
    tri_cnt = jnp.where(live, tri_cnt, 0)
    draw_slot = jnp.where(live, draw_slot, 0)

    # Resolve the per-pass (instance, slot) -> material id binding. Unbound
    # slots use material 0 (the engine default material instance, mirroring
    # RenderPass.cpp:744-801's defaulting behavior).
    if slot_materials is not None:
        draw_material = slot_materials[jnp.maximum(draw_instance, 0), draw_slot]
        draw_material = jnp.where(live, draw_material, 0)
    else:
        draw_material = jnp.zeros_like(draw_slot)

    return PreprocessResult(
        matrices=matrices,
        visible=visible,
        lod=lod,
        draw_instance=draw_instance,
        draw_mesh=draw_mesh,
        draw_slot=draw_slot,
        draw_material=draw_material,
        draw_tri_offset=tri_off,
        draw_tri_count=tri_cnt,
        draw_count=draw_count,
        total_tris=jnp.sum(tri_cnt).astype(jnp.int32),
    )


def mesh_group_instance_counts(result: PreprocessResult, num_meshes: int) -> jax.Array:
    """Per-mesh instance counts — the DrawCommand.instanceCount analogue
    (IndirectDrawBuild.comp:132). Deterministic segment-sum, not atomics."""
    live = result.draw_instance >= 0
    return jnp.zeros((num_meshes,), jnp.int32).at[
        jnp.where(live, result.draw_mesh, num_meshes)
    ].add(live.astype(jnp.int32), mode="drop")
