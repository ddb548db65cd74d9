"""Screen-tile sharded rendering via shard_map.

Decomposition (the multi-device answer to the reference's single-GPU pixel
parallelism, BASELINE config 5):

  * the scene (instance SoA, tables, geometry, materials, BVH inputs) is
    REPLICATED — every chip holds a copy, like every GPU SM seeing the whole
    TLAS;
  * the framebuffer is SHARDED over a 2D ("rows", "cols") mesh — each chip
    rasterizes / traces only its window, using the window-origin support in
    ops.raster.rasterize / ops.trace.raygen;
  * no collectives are needed in the steady state: preprocess + BVH build is
    replicated compute (cheap vs. pixels), pixel work is embarrassingly
    parallel over ICI-adjacent tiles, and the output stays sharded for the
    next stage (tonemap is elementwise). Host gather only on readback.

Instance-parallel preprocess (shard over instances + collective compaction)
is the follow-up axis for >1M-instance scenes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P_

from ..core.camera import CameraMatrices
from ..core.geometry import GeometryArrays
from ..core.material import MaterialTable
from ..core.scene import InstanceArrays, SceneTables
from ..ops import preprocess as P
from ..ops import raster as R
from ..ops.bvh import build_bvh
from ..ops.shading import Lights, shade_gbuffer
from ..ops.tonemap import TonemapParams, tonemap
from ..ops.trace import RTParams, trace_frame


def sharded_render_frame(
    mesh: Mesh,
    instances: InstanceArrays,
    tables: SceneTables,
    geo: GeometryArrays,
    materials: MaterialTable,
    lights: Lights,
    camera: CameraMatrices,
    slot_materials: jax.Array,
    instance_visible: jax.Array,
    tonemap_params: TonemapParams,
    textures=None,
    *,
    width: int,
    height: int,
    max_meshes_per_lod: int,
    tri_capacity: int,
    do_culling: bool = True,
):
    """Raster frame sharded over screen tiles. Returns ldr f32[H, W, 3]
    (device-sharded over (rows, cols)). ``textures`` (a TextureArrays) is
    replicated — the atlas is read-only sampled on every device."""
    rows, cols = mesh.devices.shape
    assert height % rows == 0 and width % cols == 0, "image must tile evenly"
    tile_h, tile_w = height // rows, width // cols
    ax_r, ax_c = mesh.axis_names

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P_(),) * 9 + ((P_(),) if textures is not None else ()),
        out_specs=P_(ax_r, ax_c, None),
    )
    def frame(instances, tables, geo, materials, lights, camera,
              slot_materials, instance_visible, tonemap_params,
              *maybe_tex):
        textures = maybe_tex[0] if maybe_tex else None
        ri = jax.lax.axis_index(ax_r)
        ci = jax.lax.axis_index(ax_c)
        pre = P.preprocess_instances(
            instances, tables, camera,
            max_meshes_per_lod=max_meshes_per_lod,
            do_culling=do_culling,
            instance_visible=instance_visible,
            slot_materials=slot_materials,
        )
        batch = R.build_triangle_batch(pre, geo, camera, capacity=tri_capacity)
        depth, tid, bary = R.rasterize(
            batch, tile_w, tile_h,
            full_width=width, full_height=height,
            origin=(ci * tile_w, ri * tile_h),
        )
        gbuf = R.resolve_gbuffer(batch, depth, tid, bary)
        hdr = shade_gbuffer(gbuf, materials, lights, camera.cam_pos,
                            textures=textures)
        return tonemap(hdr, tonemap_params)

    args = (instances, tables, geo, materials, lights, camera,
            slot_materials, instance_visible, tonemap_params)
    if textures is not None:
        args = args + (textures,)
    return frame(*args)


def sharded_render_frame_static(
    mesh: Mesh,
    mapping,                      # ops.static_batch.StaticMapping
    instances: InstanceArrays,
    tables: SceneTables,
    materials: MaterialTable,
    lights: Lights,
    camera: CameraMatrices,
    slot_materials: jax.Array,
    instance_visible: jax.Array,
    tonemap_params: TonemapParams,
    textures=None,
    *,
    width: int,
    height: int,
    do_culling: bool = True,
):
    """Two-axis decomposition of the static fast path:

      * triangle expansion is SHARDED over the leading triangle axis (the
        data-parallel axis): each device transforms T/n triangles, then an
        ``all_gather`` over ICI assembles the full clip-space batch (~50 B per
        triangle — bandwidth-trivial vs. the pixel work it feeds);
      * rasterization + shading stay screen-tile sharded as in
        sharded_render_frame.

    Returns ldr f32[H, W, 3] sharded over (rows, cols).
    """
    rows, cols = mesh.devices.shape
    assert height % rows == 0 and width % cols == 0
    n_dev = rows * cols
    assert mapping.capacity % n_dev == 0, "triangle capacity must split evenly"
    tile_h, tile_w = height // rows, width // cols
    ax = mesh.axis_names                    # both axes shard the triangle dim

    from ..ops.static_batch import StaticMapping, expand_static

    mapping_specs = StaticMapping(
        tri_instance=P_(ax), tri_lod=P_(ax), tri_slot=P_(ax),
        v_obj=P_(ax), n_obj=P_(ax), uv=P_(ax), valid=P_(ax),
        # run metadata is replicated (run starts can land on any shard; the
        # sharded path uses the per-triangle gather route, use_runs=False)
        run_starts=P_(), run_inst=P_(), run_lod=P_(), run_slot=P_(),
        run_id=P_(ax), start_mask=P_(ax),
        max_run=mapping.max_run,
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(mapping_specs,) + (P_(),) * 8
        + ((P_(),) if textures is not None else ()),
        out_specs=P_(ax[0], ax[1], None),
    )
    def frame(local_mapping, instances, tables, materials, lights, camera,
              slot_materials, instance_visible, tonemap_params, *maybe_tex):
        textures = maybe_tex[0] if maybe_tex else None
        ri = jax.lax.axis_index(ax[0])
        ci = jax.lax.axis_index(ax[1])
        local_batch, _vis = expand_static(
            local_mapping, instances, tables, camera, slot_materials,
            instance_visible, do_culling=do_culling, use_runs=False,
        )
        # assemble the full batch on every device (dp -> replicated)
        batch = jax.tree.map(
            lambda x: jax.lax.all_gather(x, ax, axis=0, tiled=True), local_batch
        )
        depth, tid, bary = R.rasterize(
            batch, tile_w, tile_h,
            full_width=width, full_height=height,
            origin=(ci * tile_w, ri * tile_h),
        )
        gbuf = R.resolve_gbuffer_packed(
            R.pack_attributes(batch), depth, tid, bary, camera,
            full_width=width, full_height=height,
            origin=(ci * tile_w, ri * tile_h),
        )
        hdr = shade_gbuffer(gbuf, materials, lights, camera.cam_pos,
                            textures=textures)
        return tonemap(hdr, tonemap_params)

    args = (mapping, instances, tables, materials, lights, camera,
            slot_materials, instance_visible, tonemap_params)
    if textures is not None:
        args = args + (textures,)
    return frame(*args)


def sharded_rt_frame(
    mesh: Mesh,
    instances: InstanceArrays,
    tables: SceneTables,
    geo: GeometryArrays,
    materials: MaterialTable,
    lights: Lights,
    camera: CameraMatrices,
    slot_materials: jax.Array,
    tonemap_params: TonemapParams,
    key: jax.Array,
    *,
    width: int,
    height: int,
    max_meshes_per_lod: int,
    tri_capacity: int,
    params: RTParams,
):
    """Ray-traced frame sharded over screen tiles (ray-batch sharding)."""
    rows, cols = mesh.devices.shape
    assert height % rows == 0 and width % cols == 0
    tile_h, tile_w = height // rows, width // cols
    ax_r, ax_c = mesh.axis_names

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P_(),) * 9,
        out_specs=P_(ax_r, ax_c, None),
    )
    def frame(instances, tables, geo, materials, lights, camera,
              slot_materials, tonemap_params, key):
        ri = jax.lax.axis_index(ax_r)
        ci = jax.lax.axis_index(ax_c)
        pre = P.preprocess_instances(
            instances, tables, camera,
            max_meshes_per_lod=max_meshes_per_lod,
            do_culling=False,
            slot_materials=slot_materials,
            lod_override=0,
        )
        batch = R.build_triangle_batch(pre, geo, camera, capacity=tri_capacity)
        lo = batch.world.min(axis=1)
        hi = batch.world.max(axis=1)
        bvh = build_bvh(lo, hi, batch.valid)
        tile_key = jax.random.fold_in(key, ri * cols + ci)
        from ..ops.trace import BatchTracer

        ctx = BatchTracer(batch, bvh, materials,
                          leaf_cutout=params.leaf_cutout)
        hdr = trace_frame(
            ctx, materials, lights, camera, tile_key,
            width=tile_w, height=tile_h, params=params,
            full_width=width, full_height=height,
            origin=(ci * tile_w, ri * tile_h),
        )
        return tonemap(hdr, tonemap_params)

    return frame(
        instances, tables, geo, materials, lights, camera,
        slot_materials, tonemap_params, key,
    )
