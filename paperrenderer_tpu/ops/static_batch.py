"""Static triangle expansion: scene-topology-keyed triangle buffers.

The draw-list path (ops.preprocess -> ops.raster.build_triangle_batch)
mirrors the reference's per-frame GPU-driven draw build: compaction +
searchsorted expansion + attribute gathers every frame. On TPU those gathers
dominate frame time, and they are *redundant*: the (triangle -> instance,
vertex data) mapping only changes when the scene's topology changes (instance
add/remove, model registration) — exactly when the reference rebuilds its
buffers (PaperRenderer.cpp:151-196).

So the fast path pre-expands once per topology version:

  * every instance contributes ALL of its model's LODs' triangles to a flat
    static buffer (object-space positions/normals/uvs pre-gathered);
  * per frame: instance matrices -> one [T] gather of 12 floats -> dense
    transform + clip projection; frustum culling and LOD selection become
    per-triangle *masks* (culled/wrong-LOD triangles are marked invalid and
    cost nothing downstream thanks to the rasterizer's binning).

Per-frame cost is pure vectorized math over [T] — the TPU equivalent of the
reference's "static scenes use next to no CPU time" claim (docs.html:29-31).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import CameraMatrices
from ..core.scene import InstanceArrays, Scene, SceneTables
from ..core.transforms import trs_to_mat34
from .preprocess import frustum_cull, select_lod
from .raster import TriangleBatch


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StaticMapping:
    """Pre-expanded per-triangle scene data (device-resident)."""

    tri_instance: jax.Array  # i32[T] — instance slot
    tri_lod: jax.Array       # i32[T] — LOD this triangle belongs to
    tri_slot: jax.Array      # i32[T] — material slot
    v_obj: jax.Array         # f32[T, 3, 3] object-space positions
    n_obj: jax.Array         # f32[T, 3, 3] object-space normals
    uv: jax.Array            # f32[T, 3, 2]
    valid: jax.Array         # bool[T]
    # run structure: triangles of one (instance, lod, slot) mesh are
    # contiguous; per-run per-frame values (matrix, visibility, material)
    # are seeded at run starts and fill-forwarded — ~R row gathers instead
    # of ~T (the [T] row gather was 60% of expand time at 450k triangles)
    run_starts: jax.Array    # i32[R] first triangle of each run
    run_inst: jax.Array      # i32[R]
    run_lod: jax.Array       # i32[R]
    run_slot: jax.Array      # i32[R]
    run_id: jax.Array        # i32[T] run id per triangle (-1 = dead tail)
    start_mask: jax.Array    # bool[T] true at run starts
    # STATIC fill-forward take masks (round 5): the jump-fill propagation
    # pattern is fully determined by the (static) run structure, so the
    # per-pass "(~filled) & shifted_filled & same-run" bookkeeping is
    # precomputed here — expand's passes become one select each instead of
    # carrying dynamic bool planes (measured ~5 ms of bitpacked pred
    # traffic per 100k-instance frame)
    fill_takes: tuple = ()   # tuple of bool[T], one per pow2 pass
    max_run: int = dataclasses.field(metadata=dict(static=True), default=1)

    @property
    def capacity(self) -> int:
        return self.tri_instance.shape[0]


def _tier(n: int, floor: int = 2048) -> int:
    """Geometric capacity tiers at 1.25x steps (4096-aligned). Pow2 tiers
    padded up to 2x: at config-5 scale a 4.3M-triangle scene ran EVERY
    per-triangle stage (expand fill-forward, coefficients, binning) over an
    8.4M capacity. 1.25x mirrors the reference's amortized growth factors
    (PaperRenderer.h:70-71 1.4x, AccelerationStructure.h:152 1.5x) while
    capping dead padding at 25%."""
    n = max(n, floor)
    cap = floor
    while cap < n:
        cap = -(-(cap * 5) // (4 * 256)) * 256
    return cap


def _morton_u64(p: np.ndarray) -> np.ndarray:
    """21-bit/axis morton codes for spatial ordering (host-side). Uses the
    native scenecore.morton3d when built (the C++ hot loop for large
    topology rebuilds); numpy fallback below."""
    try:
        from ..native import AVAILABLE, morton3d

        if AVAILABLE:
            return morton3d(p, p.min(axis=0), p.max(axis=0))
    except Exception:
        pass
    lo = p.min(axis=0)
    ext = np.maximum(p.max(axis=0) - lo, 1e-12)
    q = np.clip((p - lo) / ext * 2047.0, 0, 2047).astype(np.uint64)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x0000FF0000FF)
        v = (v | (v << 8)) & np.uint64(0x00F00F00F00F)
        v = (v | (v << 4)) & np.uint64(0x0C30C30C30C3)
        v = (v | (v << 2)) & np.uint64(0x249249249249)
        return v

    return (spread(q[:, 0]) << np.uint64(2)) | (spread(q[:, 1]) << np.uint64(1)) | spread(q[:, 2])


def build_static_mapping(
    scene: Scene, capacity: Optional[int] = None, spatial_sort: bool = True
) -> StaticMapping:
    """Host-side expansion (numpy); call when scene topology changes.

    ``spatial_sort`` orders instances by world morton code so triangle chunks
    stay spatially tight — the binned rasterizer then needs no per-frame
    triangle sort (chunk AABBs are computed over this build-time order)."""
    arena = scene.arena
    rows_inst: list = []
    rows_lod: list = []
    rows_slot: list = []
    tri_ranges: list = []  # (tri_offset, tri_count) in the arena
    order = list(scene.instances)
    if spatial_sort and len(order) > 1:
        pos = np.stack([i.position for i in order])
        codes = _morton_u64(pos)
        order = [order[i] for i in np.argsort(codes, kind="stable")]
    for inst in order:
        for lod_i, lod in enumerate(inst.model.lods):
            for mm in lod.meshes:
                rows_inst.append(inst.index)
                rows_lod.append(lod_i)
                rows_slot.append(mm.material_slot)
                tri_ranges.append((mm.handle.tri_offset, mm.handle.tri_count))
    total = sum(c for _, c in tri_ranges)
    cap = capacity or _tier(total)
    if total > cap:
        raise ValueError(f"static mapping overflow: {total} > {cap}")

    tri_instance = np.zeros(cap, np.int32)
    tri_lod = np.zeros(cap, np.int32)
    tri_slot = np.zeros(cap, np.int32)
    arena_tri = np.zeros(cap, np.int64)
    valid = np.zeros(cap, bool)
    run_id = np.full(cap, -1, np.int32)
    run_starts = np.zeros(max(1, len(tri_ranges)), np.int32)
    start_mask = np.zeros(cap, bool)
    max_run = 1
    w = 0
    for ri, ((off, cnt), ii, ll, ss) in enumerate(
            zip(tri_ranges, rows_inst, rows_lod, rows_slot)):
        tri_instance[w : w + cnt] = ii
        tri_lod[w : w + cnt] = ll
        tri_slot[w : w + cnt] = ss
        arena_tri[w : w + cnt] = np.arange(off, off + cnt)
        valid[w : w + cnt] = True
        run_id[w : w + cnt] = ri
        # zero-length runs scatter out of range (mode="drop") so they can't
        # collide with the next run's start row
        run_starts[ri] = w if cnt > 0 else cap
        start_mask[w : w + 1] = cnt > 0
        max_run = max(max_run, cnt)
        w += cnt

    idx = arena._idx[arena_tri]            # [cap, 3] vertex ids (0 for dead)
    v_obj = arena._pos[idx]                # [cap, 3, 3]
    n_obj = arena._nrm[idx]
    uv = arena._uv[idx]

    # simulate the jump-fill ONCE at build time (run structure is static)
    takes = []
    filled = start_mask.copy()
    k = 1
    while k < max_run:
        sf = np.concatenate([np.zeros(k, bool), filled[:-k]])
        ss = np.concatenate([np.full(k, -2, np.int32), run_id[:-k]])
        take = (~filled) & sf & (ss == run_id)
        takes.append(jnp.asarray(take))
        filled |= take
        k *= 2

    return StaticMapping(
        tri_instance=jnp.asarray(tri_instance),
        tri_lod=jnp.asarray(tri_lod),
        tri_slot=jnp.asarray(tri_slot),
        v_obj=jnp.asarray(v_obj),
        n_obj=jnp.asarray(n_obj),
        uv=jnp.asarray(uv),
        valid=jnp.asarray(valid),
        run_starts=jnp.asarray(run_starts),
        run_inst=jnp.asarray(np.asarray(rows_inst, np.int32).reshape(-1)
                             if rows_inst else np.zeros(1, np.int32)),
        run_lod=jnp.asarray(np.asarray(rows_lod, np.int32).reshape(-1)
                            if rows_lod else np.zeros(1, np.int32)),
        run_slot=jnp.asarray(np.asarray(rows_slot, np.int32).reshape(-1)
                             if rows_slot else np.zeros(1, np.int32)),
        run_id=jnp.asarray(run_id),
        start_mask=jnp.asarray(start_mask),
        fill_takes=tuple(takes),
        max_run=int(max_run),
    )


def expand_static(
    mapping: StaticMapping,
    instances: InstanceArrays,
    tables: SceneTables,
    camera: CameraMatrices,
    slot_materials: jax.Array,           # i32[N, S]
    instance_visible: Optional[jax.Array] = None,
    *,
    do_culling: bool = True,
    lod_override: Optional[int] = None,
    animate_time: Optional[jax.Array] = None,
    animate=None,
    use_runs: bool = True,
) -> TriangleBatch:
    """Per-frame: instance math + dense transform -> TriangleBatch.

    ``animate`` optionally applies a vertex-space animation function
    f(v_obj, time) -> v_obj before transforming (the unique-geometry
    animation path, BasicAnimation.comp analogue).
    """
    model_id = jnp.maximum(instances.model_id, 0)
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

    v_obj = mapping.v_obj
    if animate is not None and animate_time is not None:
        v_obj = animate(v_obj, animate_time)

    if not use_runs:
        # per-triangle gather path — used where the triangle axis is sharded
        # (runs can cross shard boundaries, so seeds may land off-shard)
        ti = mapping.tri_instance
        tri_valid = mapping.valid & visible[ti] & (lod[ti] == mapping.tri_lod)
        m12 = matrices.reshape(-1, 12)[ti].T               # [12, T]
        material = slot_materials[jnp.maximum(ti, 0), mapping.tri_slot]
        return (_finish_expand(mapping, camera, v_obj, m12, material,
                               tri_valid), visible)

    # Per-run per-frame values (matrix 12 | valid flag | material id):
    # gather R run rows, scatter them at the static run starts, and
    # fill-forward down each run with log2(max_run) shifted selects. This
    # replaces the [T] row gather (~30 ns/row x 450k tris = 13.5 ms at
    # config-2 scale) with ~R tiny gathers + a few fused passes over the
    # value table.
    #
    # CHANNEL-MAJOR [14, T] layout: a [T, 14] f32 table is lane-padded
    # 14 -> 128 by T(8,128) tiling (8x+ its logical HBM), and each of the
    # ~log2(max_run) fill passes re-materializes it — at config-5 scale
    # (4M+ capacity) that padding dominated expand. [14, T] tiles exactly
    # (T is a multiple of 256), so the passes stream logical bytes only;
    # the shifted selects run along lanes instead of sublanes.
    ri = mapping.run_inst
    s_slots = slot_materials.shape[1]
    if s_slots <= 8:
        # ONE packed per-instance row gather (TPU gathers are latency-bound
        # PER ROW — four separate [R] gathers of matrices/visible/lod/
        # materials cost 4x this single [R, 14+S] one)
        inst_vals = jnp.concatenate(
            [matrices.reshape(-1, 12),
             visible.astype(jnp.float32)[:, None],
             lod.astype(jnp.float32)[:, None],
             slot_materials.astype(jnp.float32)], axis=-1)   # [N, 14+S]
        rows = inst_vals[ri]                                 # [R, 14+S]
        m12_runs = rows[:, :12]
        run_ok = ((rows[:, 12] > 0.5)
                  & (rows[:, 13] == mapping.run_lod.astype(jnp.float32))
                  ).astype(jnp.float32)
        mat_runs = rows[:, 14]
        for s in range(1, s_slots):
            mat_runs = jnp.where(mapping.run_slot == s, rows[:, 14 + s],
                                 mat_runs)
    else:
        m12_runs = matrices.reshape(-1, 12)[ri]                # [R, 12]
        lod_ok_runs = lod[ri] == mapping.run_lod
        run_ok = (visible[ri] & lod_ok_runs).astype(jnp.float32)
        mat_runs = slot_materials[ri, mapping.run_slot].astype(jnp.float32)
    seed = jnp.concatenate(
        [m12_runs, run_ok[:, None], mat_runs[:, None]], axis=-1)  # [R, 14]

    t_cap = mapping.capacity
    vals = jnp.zeros((14, t_cap), jnp.float32).at[
        :, mapping.run_starts].set(seed.T, mode="drop")
    # jump-fill with BUILD-TIME take masks (see StaticMapping.fill_takes):
    # each pass is one shifted select over [14, T] — no dynamic bool planes
    k = 1
    for take in mapping.fill_takes:
        pad_v = jnp.zeros((14, k), jnp.float32)
        sv = jnp.concatenate([pad_v, vals[:, :-k]], axis=1)
        vals = jnp.where(take[None, :], sv, vals)
        k *= 2

    m12 = vals[:12]                                    # [12, T]
    tri_valid = mapping.valid & (vals[12] > 0.5)
    material = vals[13].astype(jnp.int32)
    return (_finish_expand(mapping, camera, v_obj, m12, material, tri_valid),
            visible)


def _finish_expand(mapping, camera, v_obj, m12, material, tri_valid):
    """Dense transform + clip projection -> TriangleBatch.

    Explicit broadcast arithmetic instead of einsum: XLA lowers batched
    3x3 einsums to tiny-matmul loops on TPU; these are plain VPU FMAs.
    ``m12`` is channel-major [12, T] (see expand_static's layout note)."""
    def apply34(mat, pts):  # mat [12,T] channel-major 3x4, pts [T,3,3]
        out = []
        for i in range(3):
            out.append(
                mat[4 * i + 0][:, None] * pts[..., 0]
                + mat[4 * i + 1][:, None] * pts[..., 1]
                + mat[4 * i + 2][:, None] * pts[..., 2]
                + mat[4 * i + 3][:, None]
            )
        return jnp.stack(out, axis=-1)

    def rotate(mat, vecs):
        out = []
        for i in range(3):
            out.append(
                mat[4 * i + 0][:, None] * vecs[..., 0]
                + mat[4 * i + 1][:, None] * vecs[..., 1]
                + mat[4 * i + 2][:, None] * vecs[..., 2]
            )
        return jnp.stack(out, axis=-1)

    world = apply34(m12, v_obj)
    n_world = rotate(m12, mapping.n_obj)
    n_world = n_world / jnp.maximum(
        jnp.linalg.norm(n_world, axis=-1, keepdims=True), 1e-12
    )
    vp = camera.view_proj
    clip = jnp.stack(
        [
            vp[i, 0] * world[..., 0]
            + vp[i, 1] * world[..., 1]
            + vp[i, 2] * world[..., 2]
            + vp[i, 3]
            for i in range(4)
        ],
        axis=-1,
    )

    return TriangleBatch(
        clip=clip,
        world=world,
        normal=n_world,
        uv=mapping.uv,
        material=material,
        valid=tri_valid,
    )
