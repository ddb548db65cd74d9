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
        batch = R.attach_cull(batch, materials)
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
    use_pallas: bool = False,
    work_capacity: int = 0,
    return_required: bool = False,
    translucent_layers: int = 0,
    supersample: int = 1,
):
    """Two-axis decomposition of the static fast path:

      * triangle expansion is SHARDED over the leading triangle axis (the
        data-parallel axis): each device transforms T/n triangles, then an
        ``all_gather`` over ICI assembles the full clip-space batch (~50 B per
        triangle — bandwidth-trivial vs. the pixel work it feeds);
      * rasterization + shading stay screen-tile sharded as in
        sharded_render_frame. ``use_pallas=True`` rasterizes each device's
        window with the exact-binned Pallas kernel (ops/raster_exact) —
        the round-2 fast path — using full-viewport coefficients + window
        origin, so edge tests are bitwise identical to a single-device run.

    Returns ldr f32[H, W, 3] sharded over (rows, cols); with
    ``return_required=True`` also the replicated global pair-demand scalar
    (max over devices — feed it to the overflow-growth protocol exactly like
    render_frame_static's ``required_work``).

    ``translucent_layers``/``supersample`` mirror render_frame_static: each
    device depth-peels + blends its own window (full-viewport coefficients,
    window origin) and box-resolves its ss x ss supersampled tile before
    tonemap, so the sharded image matches the single-device one.
    """
    rows, cols = mesh.devices.shape
    assert height % rows == 0 and width % cols == 0
    n_dev = rows * cols
    assert mapping.capacity % n_dev == 0, "triangle capacity must split evenly"
    ss = max(1, int(supersample))
    width, height = width * ss, height * ss
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
        fill_takes=tuple(P_(ax) for _ in mapping.fill_takes),
        max_run=mapping.max_run,
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(mapping_specs,) + (P_(),) * 8
        + ((P_(),) if textures is not None else ()),
        out_specs=(P_(ax[0], ax[1], None), P_()),
        # pallas_call inside shard_map has no vma annotations on its
        # out_shapes; skip the varying-mesh-axes check
        check_vma=False,
    )
    def frame(local_mapping, instances, tables, materials, lights, camera,
              slot_materials, instance_visible, tonemap_params, *maybe_tex):
        textures = maybe_tex[0] if maybe_tex else None
        ri = jax.lax.axis_index(ax[0])
        ci = jax.lax.axis_index(ax[1])
        origin = (ci * tile_w, ri * tile_h)
        local_batch, _vis = expand_static(
            local_mapping, instances, tables, camera, slot_materials,
            instance_visible, do_culling=do_culling, use_runs=False,
        )
        # assemble the full batch on every device (dp -> replicated)
        batch = jax.tree.map(
            lambda x: jax.lax.all_gather(x, ax, axis=0, tiled=True), local_batch
        )
        batch = R.attach_cull(batch, materials)
        full_batch = batch
        if translucent_layers > 0:
            # opaque pass must not z-write translucent/cutout geometry
            import dataclasses as _dc

            from ..ops.translucency import non_opaque_mask

            opaque = ~non_opaque_mask(materials, batch.material)
            batch = _dc.replace(batch, valid=batch.valid & opaque)
        if use_pallas:
            from ..ops.raster_exact import (
                rasterize_exact, resolve_gbuffer_pairs,
            )

            depth, tid, attr_pairs, required = rasterize_exact(
                batch, tile_w, tile_h,
                pair_capacity=work_capacity or None,
                full_width=width, full_height=height, origin=origin,
            )
            gbuf = resolve_gbuffer_pairs(
                attr_pairs, depth, tid, camera,
                full_width=width, full_height=height, origin=origin,
            )
            # replicated global demand drives the host growth protocol
            required = jax.lax.pmax(jax.lax.pmax(required, ax[0]), ax[1])
        else:
            depth, tid, bary = R.rasterize(
                batch, tile_w, tile_h,
                full_width=width, full_height=height, origin=origin,
            )
            gbuf = R.resolve_gbuffer_packed(
                R.pack_attributes(batch), depth, tid, bary, camera,
                full_width=width, full_height=height, origin=origin,
            )
            required = jnp.int32(0)
        hdr = shade_gbuffer(gbuf, materials, lights, camera.cam_pos,
                            textures=textures)
        if translucent_layers > 0:
            from ..ops.translucency import composite_translucency

            hdr, peel_required = composite_translucency(
                hdr, depth, full_batch, materials, lights, camera,
                layers=translucent_layers,
                use_exact=use_pallas, pair_capacity=work_capacity,
                textures=textures,
                full_width=width, full_height=height, origin=origin,
            )
            if use_pallas:
                peel_required = jax.lax.pmax(
                    jax.lax.pmax(peel_required, ax[0]), ax[1])
            required = jnp.maximum(required, peel_required)
        if ss > 1:
            # per-device box resolve of the ss x ss supersampled tile
            # (strided slices — see render_frame_static's layout note)
            acc = hdr[0::ss, 0::ss]
            for i in range(ss):
                for j in range(ss):
                    if i or j:
                        acc = acc + hdr[i::ss, j::ss]
            hdr = acc * (1.0 / (ss * ss))
        return tonemap(hdr, tonemap_params), required

    args = (mapping, instances, tables, materials, lights, camera,
            slot_materials, instance_visible, tonemap_params)
    if textures is not None:
        args = args + (textures,)
    ldr, required = frame(*args)
    return (ldr, required) if return_required else ldr


@partial(
    jax.jit,
    static_argnames=("width", "height", "rows", "cols", "do_culling",
                     "translucent_layers", "supersample"),
)
def measure_sharded_demand(
    mapping,
    instances: InstanceArrays,
    tables: SceneTables,
    camera: CameraMatrices,
    slot_materials: jax.Array,
    instance_visible: jax.Array,
    materials: MaterialTable | None = None,
    *,
    width: int,
    height: int,
    rows: int,
    cols: int,
    do_culling: bool = True,
    translucent_layers: int = 0,
    supersample: int = 1,
) -> jax.Array:
    """Per-device pair/slot demand of sharded_render_frame_static
    (use_pallas=True) WITHOUT compiling/running it: the capacity probe
    (ops.raster_exact.measure_pair_demand) evaluated over every (rows x
    cols) screen-tile window, maxed — the same scalar the sharded frame
    returns replicated via pmax as ``required``. Runs on one device in
    seconds at any scale; size ``work_capacity`` from it BEFORE paying the
    sharded pipeline's compile (the reference sizes mesh-group buffers the
    same way before rebuilding, IndirectDraw.cpp:44-125)."""
    from ..ops.raster_exact import measure_pair_demand
    from ..ops.static_batch import expand_static

    # mirror sharded_render_frame_static's grid contract: an uneven grid
    # would silently probe wrong windows and under-size capacity
    assert height % rows == 0 and width % cols == 0
    ss = max(1, int(supersample))
    width, height = width * ss, height * ss
    tile_h, tile_w = height // rows, width // cols
    batch, _vis = expand_static(
        mapping, instances, tables, camera, slot_materials,
        instance_visible, do_culling=do_culling, use_runs=False,
    )
    if materials is not None:
        # match the pipeline's per-material back-face culling — omitting it
        # would over-count demand (safe but breaks probe==pipeline pinning)
        batch = R.attach_cull(batch, materials)
    origins = jnp.asarray(
        [(c * tile_w, r * tile_h) for r in range(rows) for c in range(cols)],
        jnp.int32,
    )

    def tile_demand(b):
        return jnp.max(jax.vmap(
            lambda o: measure_pair_demand(
                b, tile_w, tile_h,
                full_width=width, full_height=height, origin=o,
            )
        )(origins))

    if translucent_layers > 0:
        # opaque and peel passes bin disjoint triangle sets; the growth
        # protocol keys off the max of both (see measure_frame_demand)
        import dataclasses as _dc

        from ..ops.translucency import non_opaque_mask

        assert materials is not None, \
            "translucent demand probe needs the material table"
        non_op = non_opaque_mask(materials, batch.material)
        return jnp.maximum(
            tile_demand(_dc.replace(batch, valid=batch.valid & ~non_op)),
            tile_demand(_dc.replace(batch, valid=batch.valid & non_op)))
    return tile_demand(batch)


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
    """LEGACY ray-traced frame sharded over screen tiles (round-1 design:
    per-frame world BVH over all transformed triangles). Kept as the
    validation reference; the fast path is ``make_sharded_rt_frame`` (two-
    level BLAS/TLAS + SceneTracer per tile)."""
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


def make_sharded_hybrid_frame(
    mesh: Mesh,
    meta,                         # ops.accel.BLASSetMeta (host-side)
    animate=None,
    *,
    use_pallas_trace: bool = False,
    paged: bool = False,
    wide: bool = True,
):
    """Screen-tile sharded hybrid frame (BASELINE config 4 across chips):
    triangle-sharded static expansion -> all_gather -> per-tile raster
    G-buffer -> per-tile RT passes (shadows / RTAO / reflections) against the
    replicated two-level BLAS/TLAS -> deferred shade + tonemap.

    Mirrors render/hybrid.make_hybrid_frame; the acceleration structure is
    assembled ONCE per frame outside shard_map (replicated compute, cheap vs
    pixels), raster demand is pmax-replicated so the host overflow-growth
    protocol sees the global maximum (render/hybrid.py round-3 weak #3).
    """
    from ..ops import accel as ACC
    from ..ops import trace as T
    from ..ops.static_batch import StaticMapping, expand_static

    @partial(
        jax.jit,
        static_argnames=(
            "width", "height", "stack_size", "do_culling", "use_pallas",
            "work_capacity", "shadow_samples", "reflection_samples",
            "ao_samples", "ao_radius", "leaf_cutout",
        ),
    )
    def hybrid_frame_sharded(
        mapping,                      # ops.static_batch.StaticMapping
        blasset,
        anim_rest,
        anim_nodes,
        instances: InstanceArrays,
        inst_blas: jax.Array,
        tri_attr: jax.Array,
        tables: SceneTables,
        materials: MaterialTable,
        lights: Lights,
        camera: CameraMatrices,
        slot_materials: jax.Array,
        instance_visible: jax.Array,
        tonemap_params: TonemapParams,
        key: jax.Array,
        time: jax.Array,
        textures=None,
        *,
        width: int,
        height: int,
        stack_size: int,
        do_culling: bool = True,
        use_pallas: bool = False,
        work_capacity: int = 0,
        shadow_samples: int = 1,
        reflection_samples: int = 1,
        ao_samples: int = 1,
        ao_radius: float = 2.0,
        leaf_cutout: bool = False,
    ):
        rows, cols = mesh.devices.shape
        assert height % rows == 0 and width % cols == 0
        n_dev = rows * cols
        assert mapping.capacity % n_dev == 0, \
            "triangle capacity must split evenly"
        tile_h, tile_w = height // rows, width // cols
        ax = mesh.axis_names

        # --- replicated AS assembly (TLAS refit; BLAS rows persistent) ------
        mask = jnp.ones(instances.capacity, bool)
        if paged:
            rt_scene, root = ACC.assemble_scene_paged(
                blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
                mask, slot_materials, tri_attr, time=time, animate=animate,
            )
        else:
            rt_scene, roots = ACC.assemble_scene(
                blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
                [mask], tri_attr, time=time, animate=animate,
            )
            root = roots[0]
        params = RTParams(
            shadow_samples=shadow_samples,
            reflection_samples=reflection_samples,
            ao_samples=ao_samples,
            ao_radius=ao_radius,
            leaf_cutout=leaf_cutout,
        )

        mapping_specs = StaticMapping(
            tri_instance=P_(ax), tri_lod=P_(ax), tri_slot=P_(ax),
            v_obj=P_(ax), n_obj=P_(ax), uv=P_(ax), valid=P_(ax),
            run_starts=P_(), run_inst=P_(), run_lod=P_(), run_slot=P_(),
            run_id=P_(ax), start_mask=P_(ax),
            fill_takes=tuple(P_(ax) for _ in mapping.fill_takes),
            max_run=mapping.max_run,
        )
        n_in = 11 if textures is not None else 10

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(mapping_specs,) + (P_(),) * n_in,
            out_specs=(P_(ax[0], ax[1], None), P_()),
            check_vma=False,     # pallas kernels may run inside
        )
        def tile(local_mapping, rt_scene, instances, tables, materials,
                 lights, camera, slot_materials, instance_visible,
                 tonemap_params, key, *maybe_tex):
            textures = maybe_tex[0] if maybe_tex else None
            ri = jax.lax.axis_index(ax[0])
            ci = jax.lax.axis_index(ax[1])
            origin = (ci * tile_w, ri * tile_h)

            # --- raster G-buffer (window of the full viewport) --------------
            local_batch, _vis = expand_static(
                local_mapping, instances, tables, camera, slot_materials,
                instance_visible, do_culling=do_culling, use_runs=False,
            )
            batch = jax.tree.map(
                lambda x: jax.lax.all_gather(x, ax, axis=0, tiled=True),
                local_batch)
            batch = R.attach_cull(batch, materials)
            if use_pallas:
                from ..ops.raster_exact import (
                    rasterize_exact, resolve_gbuffer_pairs,
                )

                depth, tid, attr_pairs, required = rasterize_exact(
                    batch, tile_w, tile_h,
                    pair_capacity=work_capacity or None,
                    full_width=width, full_height=height, origin=origin,
                )
                gbuf = resolve_gbuffer_pairs(
                    attr_pairs, depth, tid, camera,
                    full_width=width, full_height=height, origin=origin,
                )
                required = jax.lax.pmax(jax.lax.pmax(required, ax[0]), ax[1])
            else:
                depth, tid, bary = R.rasterize(
                    batch, tile_w, tile_h,
                    full_width=width, full_height=height, origin=origin,
                )
                gbuf = R.resolve_gbuffer_packed(
                    R.pack_attributes(batch), depth, tid, bary, camera,
                    full_width=width, full_height=height, origin=origin,
                )
                required = jnp.int32(0)

            # --- RT passes at the tile's G-buffer surfaces -------------------
            tracer_cls = ACC.PagedSceneTracer if paged else ACC.SceneTracer
            ctx = tracer_cls(
                rt_scene, slot_materials, materials,
                root_code=root, stack_size=stack_size,
                leaf_cutout=leaf_cutout, use_pallas=use_pallas_trace,
                textures=textures, wide=wide,
                # tile G-buffer wavefronts are row-major within the window
                image_shape=(tile_h, tile_w),
            )
            surf = T.SurfaceHits(
                world_pos=gbuf.world_pos.reshape(-1, 3),
                normal=gbuf.normal.reshape(-1, 3),
                uv=gbuf.uv.reshape(-1, 2),
                material=gbuf.material.reshape(-1),
                valid=gbuf.coverage.reshape(-1),
                t=jnp.where(gbuf.coverage.reshape(-1),
                            depth.reshape(-1), jnp.inf),
            )
            tile_key = jax.random.fold_in(key, ri * cols + ci)
            svis = T.shadow_visibility(
                surf, ctx, lights, tile_key, max(1, shadow_samples),
                compact=params.compact_secondary)
            ao = T.ambient_occlusion(
                surf, ctx, materials,
                jax.random.fold_in(tile_key, 3), ao_samples, ao_radius,
                compact=params.compact_secondary)
            hdr = shade_gbuffer(
                gbuf, materials, lights, camera.cam_pos,
                shadow_vis=svis.reshape(-1, tile_h, tile_w),
                ambient_occlusion=ao.reshape(tile_h, tile_w),
                background=T.BACKGROUND_RGB,
                textures=textures,
            )
            if reflection_samples > 0:
                refl = T.reflections(
                    surf, ctx, materials, lights, camera.cam_pos,
                    jax.random.fold_in(tile_key, 7), params,
                ).reshape(tile_h, tile_w, 3)
                hdr = hdr + jnp.where(gbuf.coverage[..., None], refl, 0.0)
            return tonemap(hdr, tonemap_params), required

        args = (mapping, rt_scene, instances, tables, materials, lights,
                camera, slot_materials, instance_visible, tonemap_params, key)
        if textures is not None:
            args = args + (textures,)
        ldr, required = tile(*args)
        aux = {"required_work": required}
        return ldr, aux

    return hybrid_frame_sharded


def make_sharded_rt_frame(
    mesh: Mesh,
    meta,                         # ops.accel.BLASSetMeta (host-side)
    animate=None,
    *,
    use_pallas: bool = False,
    paged: bool = False,          # chunked-TLAS paging (accel.prefer_paged)
    wide: bool = True,            # 4-wide grandchild box steps (non-paged)
):
    """Screen-tile sharded two-level RT frame (the round-2 fast path under
    shard_map — replaces the legacy per-frame world BVH of sharded_rt_frame).

    The acceleration structure is assembled ONCE per frame outside shard_map
    (BLAS rows persistent, TLAS refit is O(N) + one sort — replicated compute,
    cheap vs. pixels); each device then traces only its screen tile against
    the replicated RTScene with the SceneTracer (packet kernel on TPU when
    ``use_pallas``, XLA lockstep elsewhere — e.g. the virtual CPU mesh).

    Mirrors render/raytrace.make_rt_frame; reference: per-pixel
    vkCmdTraceRaysKHR parallelism (RayTrace.cpp:34-95) scaled across chips.
    """
    from ..ops import accel as ACC
    from ..ops.trace import trace_frame

    @partial(
        jax.jit,
        static_argnames=(
            "width", "height", "stack_size", "shadow_samples",
            "reflection_samples", "ao_samples", "ao_radius", "leaf_cutout",
            "tlas_index",
        ),
    )
    def rt_frame_sharded(
        blasset,
        anim_rest,
        anim_nodes,
        instances: InstanceArrays,
        inst_blas: jax.Array,
        masks,                      # tuple of bool[N], one per TLAS
        tri_attr: jax.Array,
        materials: MaterialTable,
        lights: Lights,
        camera: CameraMatrices,
        slot_materials: jax.Array,
        tonemap_params: TonemapParams,
        key: jax.Array,
        time: jax.Array,
        textures=None,
        *,
        width: int,
        height: int,
        stack_size: int,
        shadow_samples: int,
        reflection_samples: int,
        ao_samples: int,
        ao_radius: float,
        leaf_cutout: bool,
        tlas_index: int = 0,
    ):
        rows, cols = mesh.devices.shape
        assert height % rows == 0 and width % cols == 0
        tile_h, tile_w = height // rows, width // cols
        ax_r, ax_c = mesh.axis_names

        if paged:
            rt_scene, root = ACC.assemble_scene_paged(
                blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
                masks[tlas_index], slot_materials, tri_attr,
                time=time, animate=animate,
            )
        else:
            rt_scene, roots = ACC.assemble_scene(
                blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
                list(masks), tri_attr, time=time, animate=animate,
            )
            root = roots[tlas_index]
        params = RTParams(
            shadow_samples=shadow_samples,
            reflection_samples=reflection_samples,
            ao_samples=ao_samples,
            ao_radius=ao_radius,
            leaf_cutout=leaf_cutout,
        )

        n_in = 7 if textures is not None else 6

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P_(),) * n_in,
            out_specs=P_(ax_r, ax_c, None),
            check_vma=False,     # pallas packet kernel may run inside
        )
        def tile(rt_scene, materials, lights, camera, slot_materials, key,
                 *maybe_tex):
            textures = maybe_tex[0] if maybe_tex else None
            ri = jax.lax.axis_index(ax_r)
            ci = jax.lax.axis_index(ax_c)
            tracer_cls = ACC.PagedSceneTracer if paged else ACC.SceneTracer
            ctx = tracer_cls(
                rt_scene, slot_materials, materials,
                root_code=root, stack_size=stack_size,
                leaf_cutout=leaf_cutout, use_pallas=use_pallas,
                textures=textures, wide=wide,
            )
            tile_key = jax.random.fold_in(key, ri * cols + ci)
            hdr = trace_frame(
                ctx, materials, lights, camera, tile_key,
                width=tile_w, height=tile_h, params=params,
                full_width=width, full_height=height,
                origin=(ci * tile_w, ri * tile_h),
            )
            return tonemap(hdr, tonemap_params)

        args = (rt_scene, materials, lights, camera, slot_materials, key)
        if textures is not None:
            args = args + (textures,)
        return tile(*args)

    return rt_frame_sharded
