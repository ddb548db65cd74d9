"""Wavefront ray tracing: raygen, hit resolve, RT lighting passes.

TPU-native re-design of the reference RT pipeline (example shaders
raytrace.rgen / raytrace.rchit / raycommon.glsl): the recursive
``traceRayEXT`` call tree becomes flat wavefront passes over ray SoAs:

  primary rays -> trace -> surface hits
    -> shadow rays   (per light x sample, any-hit, sphere-light sampling)
    -> AO rays       (cosine hemisphere, distance-weighted — RTAO,
                      raytrace.rchit:173-219)
    -> reflection rays (cosine-perturbed mirror, 1 bounce —
                      raytrace.rchit:124-167), whose hits are shaded with
                      the same lighting (recursion depth 1, no 2nd bounce)

Sampling matches the reference's math (cosineSample raycommon.glsl:44-57,
sphere-light sampling rchit:71-90); the RNG is JAX threefry instead of the
reference's TEA/LCG (statistical, not bitwise, parity). Known reference quirk
NOT replicated: rchit:115 divides the running light total (including earlier
lights) by shadowSamples inside the per-light loop; here each light's
contribution is scaled by its own visibility fraction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import CameraMatrices
from ..core.material import MaterialTable
from .bvh import BVH, HitRecord, bvh_trace
from .raster import TriangleBatch
from .shading import Lights, point_light_contribution

BACKGROUND_RGB = (0.1, 0.1, 0.1)  # environment color, raytrace.rgen:52
BACKGROUND = jnp.asarray(BACKGROUND_RGB, jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RTParams:
    """Mirror of the example's RT uniform block (RayTraceInfo: shadow /
    reflection / AO sample counts + AO radius)."""

    shadow_samples: int = 1
    reflection_samples: int = 1
    ao_samples: int = 1
    ao_radius: float = 2.0
    leaf_cutout: bool = False  # any-hit alpha cutout for SHADE_LEAF materials
    # per-trace 8-bit cull masks tested against each instance's visibility
    # mask (the traceRayEXT cullMask parameter, raytrace.rgen:33; instance
    # masks come from AccelerationStructureInstanceData.mask,
    # RayTrace.h:19-35). ``cull_mask`` applies to primary/reflection/AO
    # rays; ``shadow_cull_mask`` to shadow rays (e.g. exclude non-shadow-
    # casting geometry classes).
    cull_mask: int = 0xFF
    shadow_cull_mask: int = 0xFF
    # trace reflections for every other column and reconstruct by neighbor
    # averaging — a TPU perf option (reflections are ~70% of the RT frame;
    # secondary packets are incoherent), NOT reference parity. Off = the
    # reference's full-rate depth-1 recursion.
    reflection_half_rate: bool = False
    # fold the 1-bounce reflection ray into the primary-side shadow+AO
    # bundle traversal (one wavefront for ALL primary-side secondary rays).
    # MEASURED SLOWER on the example scene (78.5 vs 75.8 ms @1080p): every
    # box step pays one slab test per sample across the UNION footprint,
    # and the bounce's footprint is large and mostly disjoint from the
    # local shadow/AO footprints — bundling only wins when footprints
    # overlap. Kept as an option for short-range reflection workloads.
    fuse_bounce: bool = False
    # group-compact secondary wavefronts (shadow/AO bundles + the bounce
    # trace) so parked rays pack into dead packets that exit the traversal
    # immediately (ops/compaction.py). Scheduling-only: sample directions
    # are built BEFORE the reorder, so per-ray results (and goldens) are
    # unchanged. Win scales with the wavefront's dead fraction; on a
    # full-coverage scene the reorder is ~2-4 ms of pure overhead @1080p —
    # disable there.
    compact_secondary: bool = True
    # group-compact + spatially sort ONLY the reflection-side secondary
    # wavefronts (the bundle at bounce hits, ~36% scattered liveness) while
    # the primary-side wavefronts run unpermuted. Independent of
    # ``compact_secondary`` (which covers everything).
    compact_refl: bool = False

    # static dataclass (python ints) — used as jit static argument


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SurfaceHits:
    """Resolved hit attributes for a ray wavefront."""

    world_pos: jax.Array  # f32[R, 3]
    normal: jax.Array     # f32[R, 3]
    uv: jax.Array         # f32[R, 2]
    material: jax.Array   # i32[R]
    valid: jax.Array      # bool[R]
    t: jax.Array          # f32[R]


def pick_tile(width: int, height: int):
    """Ray-packet pixel tile (th * tw == kernel PACKET): the most square
    tile that divides the image. None -> row-major order."""
    for th, tw in ((32, 32), (16, 64), (8, 128), (4, 256)):
        if height % th == 0 and width % tw == 0:
            return th, tw
    return None


def untile_image(flat: jax.Array, width: int, height: int, tile) -> jax.Array:
    """Invert raygen(tile_order)'s pixel order -> [H, W, ...] image.
    Pure reshape/transpose (vectorized relayout, no per-pixel gathers)."""
    th, tw = tile
    nty, ntx = height // th, width // tw
    x = flat.reshape((nty, ntx, th, tw) + flat.shape[1:])
    return x.transpose(
        (0, 2, 1, 3) + tuple(range(4, x.ndim))
    ).reshape((height, width) + flat.shape[1:])


def tile_image(img: jax.Array, width: int, height: int, tile) -> jax.Array:
    """Inverse of ``untile_image``: [H, W, ...] image -> flat pixel-tile-major
    wavefront [H*W, ...]. Used to reorder G-buffer surfaces into tile packets
    before secondary-ray traversal (packet cost ~ union of ray footprints);
    pure reshape/transpose, materialized once per frame."""
    th, tw = tile
    nty, ntx = height // th, width // tw
    x = img.reshape((nty, th, ntx, tw) + img.shape[2:])
    return x.transpose(
        (0, 2, 1, 3) + tuple(range(4, x.ndim))
    ).reshape((height * width,) + img.shape[2:])


def raygen(
    camera: CameraMatrices,
    width: int,
    height: int,
    *,
    full_width: int | None = None,
    full_height: int | None = None,
    origin=(0, 0),
    tile_order=None,   # (th, tw) from pick_tile, or None for row-major
):
    """Primary camera rays, matching raytrace.rgen:16-22: NDC -> unproject ->
    world. Returns (origins f32[P,3], dirs f32[P,3]) with P = H*W, row-major
    y-down (row 0 = image top = camera up, same as the rasterizer).

    ``origin``/``full_*`` generate rays for a screen-tile window (sharding).

    ``tile_order=(th, tw)`` (see ``pick_tile``) emits rays in pixel-tile-
    major order so each 1024-ray packet is one compact screen tile instead
    of a full-width row strip. Dense many-instance scenes traverse the shared-stack kernels at
    the UNION of a packet's footprint — tile packets cut that footprint
    (measured 5.8x on a 10k-instance scene, scripts/validate_paged.py).
    Pixel coords come from index arithmetic (iota) — no gathers, and no
    transpose feeding the kernel (the round-2 9x layout trap). Un-tile
    per-pixel outputs with ``untile_image``."""
    fw = full_width or width
    fh = full_height or height
    x0, y0 = origin
    if tile_order:
        th, tw = tile_order
        assert width % tw == 0 and height % th == 0
        ntx = width // tw
        idx = jnp.arange(width * height, dtype=jnp.int32)
        tile_id = idx // (th * tw)
        within = idx % (th * tw)
        yy = (tile_id // ntx) * th + within // tw
        xx = (tile_id % ntx) * tw + within % tw
        dx = (xx.astype(jnp.float32) + 0.5 + x0) / fw * 2.0 - 1.0
        dy = 1.0 - (yy.astype(jnp.float32) + 0.5 + y0) / fh * 2.0
    else:
        xs = (jnp.arange(width, dtype=jnp.float32) + 0.5 + x0) / fw * 2.0 - 1.0
        ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5 + y0) / fh * 2.0
        dx = jnp.broadcast_to(xs[None, :], (height, width)).reshape(-1)
        dy = jnp.broadcast_to(ys[:, None], (height, width)).reshape(-1)

    inv_proj = jnp.linalg.inv(camera.projection)
    ndc = jnp.stack([dx, dy, jnp.ones_like(dx), jnp.ones_like(dx)], axis=-1)
    target = ndc @ inv_proj.T
    tdir = target[:, :3] / jnp.maximum(
        jnp.linalg.norm(target[:, :3], axis=-1, keepdims=True), 1e-12
    )
    view_rot = camera.view[:3, :3]
    d = tdir @ view_rot  # = inv(view)[:3,:3] @ tdir, row-vector form
    o = jnp.broadcast_to(camera.cam_pos, d.shape)
    return o, d


def resolve_hits(
    batch: TriangleBatch, rec: HitRecord, ray_o: jax.Array, ray_d: jax.Array
) -> SurfaceHits:
    """Interpolate hit attributes (the hitcommon.glsl getHitInfo analogue)."""
    pid = jnp.maximum(rec.prim, 0)
    u = rec.bary[:, 0]
    v = rec.bary[:, 1]
    w0 = 1.0 - u - v

    t_cap = batch.capacity
    # single packed row gather (TPU gathers are latency-bound per row):
    # (w0,w1,w2 | n0,n1,n2 | uv0,uv1,uv2) = 9+9+6 floats
    packed = jnp.concatenate(
        [batch.world.reshape(t_cap, 9), batch.normal.reshape(t_cap, 9),
         batch.uv.reshape(t_cap, 6)], axis=-1,
    )[pid]                                            # [R, 24]

    def lerp3(base):
        return (
            w0[:, None] * packed[:, base : base + 3]
            + u[:, None] * packed[:, base + 3 : base + 6]
            + v[:, None] * packed[:, base + 6 : base + 9]
        )

    world = lerp3(0)
    normal = lerp3(9)
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
    # face forward: shade the side the ray arrives from (two-sided geometry)
    facing = jnp.sum(normal * ray_d, axis=-1) < 0.0
    normal = jnp.where(facing[:, None], normal, -normal)
    uv = (
        w0[:, None] * packed[:, 18:20]
        + u[:, None] * packed[:, 20:22]
        + v[:, None] * packed[:, 22:24]
    )
    return SurfaceHits(
        world_pos=world,
        normal=normal,
        uv=uv,
        material=jnp.where(rec.hit, batch.material[pid], 0),
        valid=rec.hit,
        t=rec.t,
    )


def _default_basis(n: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """ComputeDefaultBasis (raycommon.glsl:61-69), vectorized."""
    z = n
    yz = -z[..., 1] * z[..., 2]
    near_z = jnp.abs(z[..., 2]) > 0.99999
    y = jnp.where(
        near_z[..., None],
        jnp.stack([-z[..., 0] * z[..., 1], 1.0 - z[..., 1] ** 2, yz], axis=-1),
        jnp.stack([-z[..., 0] * z[..., 2], yz, 1.0 - z[..., 2] ** 2], axis=-1),
    )
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
    x = jnp.cross(y, z)
    return x, y


def _cosine_sample(
    n: jax.Array, tx: jax.Array, ty: jax.Array,
    max_offset: jax.Array, r1: jax.Array, r2: jax.Array,
) -> jax.Array:
    """cosineSample (raycommon.glsl:44-57), vectorized over rays."""
    sq = jnp.sqrt(1.0 - r2) * jnp.clip(max_offset, 0.0, 1.0)
    phi = 2.0 * jnp.pi * r1
    lx = jnp.cos(phi) * sq
    ly = jnp.sin(phi) * sq
    lz = jnp.maximum(jnp.sqrt(r2), 1e-4)
    d = lx[..., None] * tx + ly[..., None] * ty + lz[..., None] * n
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def make_leaf_alpha_test(batch: TriangleBatch, materials: MaterialTable):
    """Any-hit alpha-cutout hook for bvh_trace (leaf.rahit parity): rejects
    candidate hits on SHADE_LEAF materials where the procedural leaf pattern
    is transparent at the hit UV."""
    from ..core.material import SHADE_LEAF
    from .shading import leaf_alpha

    def test(prims, u, v):
        is_leaf = materials.shading_model[batch.material[prims]] == SHADE_LEAF
        w0 = 1.0 - u - v
        uv = (
            w0[..., None] * batch.uv[prims][..., 0, :]
            + u[..., None] * batch.uv[prims][..., 1, :]
            + v[..., None] * batch.uv[prims][..., 2, :]
        )
        return jnp.where(is_leaf, leaf_alpha(uv) >= 0.5, True)

    return test


class BatchTracer:
    """Tracer context over a per-frame world TriangleBatch + its BVH (the
    round-1 single-level path, kept as the reference/fallback tracer and for
    sharded tiles). Protocol shared with ops.accel.SceneTracer:
    ``.trace(o, d, t_max, any_hit=, active=, use_alpha=)`` and
    ``.resolve(rec, o, d)``."""

    def __init__(self, batch: TriangleBatch, bvh: BVH,
                 materials: Optional[MaterialTable] = None,
                 leaf_cutout: bool = False, textures=None):
        self.batch = batch
        self.bvh = bvh
        self.materials = materials
        self.leaf_cutout = leaf_cutout
        self.textures = textures

    def trace(self, o, d, t_max, *, any_hit=False, active=None,
              use_alpha=False, cull_mask: int = 0xFF):
        # cull_mask accepted for protocol parity with SceneTracer; the
        # legacy world-batch structure has no instance records to mask
        # (triangles are pre-transformed), so it is a no-op here
        alpha = (
            make_leaf_alpha_test(self.batch, self.materials)
            if (use_alpha and self.leaf_cutout and self.materials is not None)
            else None
        )
        return bvh_trace(
            self.bvh,
            self.batch.world[:, 0], self.batch.world[:, 1],
            self.batch.world[:, 2],
            o, d, t_max, any_hit=any_hit, active=active, alpha_test=alpha,
        )

    def resolve(self, rec: HitRecord, o, d) -> SurfaceHits:
        return resolve_hits(self.batch, rec, o, d)

    def trace_occlusion_bundle(self, o, dirs, t_caps, *, active=None,
                               cull_mask: int = 0xFF):
        """Protocol parity with SceneTracer: S any-hit traces -> i32[R]
        occlusion bitmask (bit s = sample s occluded; inactive lanes report
        all-occluded, callers mask with ``active``)."""
        bits = jnp.zeros((o.shape[0],), jnp.int32)
        for s, (d, tc) in enumerate(zip(dirs, t_caps)):
            rec = self.trace(o, d, tc, any_hit=True, active=active,
                             cull_mask=cull_mask)
            occ = rec.hit if active is None else (rec.hit | ~active)
            bits = bits | (occ.astype(jnp.int32) << s)
        return bits

    def trace_resolve(self, o, d, t_max, *, active=None, use_alpha=False,
                      cull_mask: int = 0xFF):
        rec = self.trace(o, d, t_max, active=active, use_alpha=use_alpha,
                         cull_mask=cull_mask)
        return self.resolve(rec, o, d)


def _light_shadow_samples(surf: SurfaceHits, lights: Lights, li: int,
                          key: jax.Array, samples: int):
    """Build light ``li``'s shadow-sample directions (raytrace.rchit:61-116
    sampling math). Returns ``(dirs, dist, active, n_s)`` or ``None`` when
    the light statically casts no shadows (no wavefront at all)."""
    r = surf.world_pos.shape[0]
    flags = getattr(lights, "shadow_flags", None)
    if flags is not None and li < len(flags) and not flags[li]:
        # statically known non-casting light: no shadow wavefront at all
        # (raytrace.rchit skips the ray query for castShadow=false)
        return None
    lpos = lights.position[li]
    to_l = lpos - surf.world_pos
    dist = jnp.linalg.norm(to_l, axis=-1)
    ldir = to_l / jnp.maximum(dist, 1e-9)[:, None]
    tx, ty = _default_basis(ldir)
    # reference gate (raytrace.rchit:58): shadow rays are cast only
    # where dot(N, L) > 0 — the light contribution is zero for
    # back-facing surfaces regardless of visibility, and inactive rays
    # leave the packet's traversal footprint (trace_kernel sentinel)
    ndl = jnp.sum(surf.normal * ldir, axis=-1)
    active = surf.valid & (ndl > 0.0)
    # hard light (radius statically 0): every sample's sdir falls back
    # to ldir — the N traces are the identical ray, so one suffices
    hard = getattr(lights, "hard_flags", None)
    n_s = 1 if (hard is not None and li < len(hard) and hard[li]) \
        else samples
    dirs = []
    for si in range(n_s):
        k = jax.random.fold_in(jax.random.fold_in(key, li), si)
        r1, r2 = jax.random.uniform(k, (2, r))
        # sample a point on the light sphere (rchit:84-89)
        sq = jnp.sqrt(1.0 - r2)
        phi = 2.0 * jnp.pi * r1
        offs = (
            (jnp.cos(phi) * sq)[:, None] * tx
            + (jnp.sin(phi) * sq)[:, None] * ty
            + jnp.sqrt(r2)[:, None] * ldir
        ) * lights.radius[li]
        sample_pos = lpos + offs
        sdir = sample_pos - surf.world_pos
        sdir = sdir / jnp.maximum(
            jnp.linalg.norm(sdir, axis=-1, keepdims=True), 1e-9)
        sdir = jnp.where(lights.radius[li] > 0.0, sdir, ldir)
        dirs.append(sdir)
    return dirs, dist, active, n_s


def _shadow_vis_from_bits(bits, active, cast_shadow, n_s, shift: int):
    """Occlusion bits -> per-light visibility fraction (rchit:100-116)."""
    unshadowed = jnp.zeros(bits.shape, jnp.float32)
    for si in range(n_s):
        unshadowed += 1.0 - ((bits >> (shift + si)) & 1).astype(jnp.float32)
    v = unshadowed / n_s
    # inactive rays (no-shadow gate / invalid surfaces) report
    # all-occluded through the bundle; they are fully visible in the
    # reference semantics (the ray query is skipped)
    v = jnp.where(active, v, 1.0)
    return jnp.where(cast_shadow, v, 1.0)


def _or_actives(actives):
    """OR of per-sample active masks; None when any sample is always-live
    (compaction then has nothing to pack away)."""
    live = None
    for a in actives:
        if a is None:
            return None
        live = a if live is None else (live | a)
    return live


def _permute_surface(surf: SurfaceHits, perm: jax.Array) -> SurfaceHits:
    """Group-permute every SurfaceHits plane (one gather per dtype)."""
    from .compaction import permute_flat

    f = permute_flat(
        [surf.world_pos[:, 0], surf.world_pos[:, 1], surf.world_pos[:, 2],
         surf.normal[:, 0], surf.normal[:, 1], surf.normal[:, 2],
         surf.uv[:, 0], surf.uv[:, 1], surf.t,
         surf.material, surf.valid], perm)
    return SurfaceHits(
        world_pos=jnp.stack(f[0:3], axis=-1),
        normal=jnp.stack(f[3:6], axis=-1),
        uv=jnp.stack(f[6:8], axis=-1),
        material=f[9], valid=f[10], t=f[8],
    )


def _compact_bundle(ctx, origin, occ_ds, occ_tcs, occ_actives,
                    ao_ds, ao_tcs, ao_actives, cull_mask,
                    rs_d=None, rs_tc=None, rs_active=None):
    """Fused-bundle call with group compaction (ops/compaction.py): the
    already-built sample rays are reordered so live groups lead and the
    trailing packets are fully parked (they exit the traversal at the root
    step), then the outputs are un-permuted. Scheduling-only — per-ray
    results are unchanged (directions/randoms were built before the
    reorder). Falls through to the plain call when no sample carries an
    active mask or the wavefront is too small to pay for the reorder."""
    from . import compaction as C

    r = origin.shape[0]
    has_rs = rs_d is not None
    live = _or_actives(list(occ_actives) + list(ao_actives)
                       + ([rs_active] if has_rs else []))
    if live is None or not C.compactable(r):
        if not has_rs:
            return ctx.trace_shadow_ao_bundle(
                origin, occ_ds, occ_tcs, ao_ds, ao_tcs,
                occ_actives=occ_actives, ao_actives=ao_actives,
                cull_mask=cull_mask)
        return ctx.trace_shadow_ao_resolve_bundle(
            origin, occ_ds, occ_tcs, ao_ds, ao_tcs, rs_d, rs_tc,
            occ_actives=occ_actives, ao_actives=ao_actives,
            rs_active=rs_active, cull_mask=cull_mask)

    # group key: liveness partition + morton sort of live-group origin
    # centroids (spatial packet clustering — shrinks the shared-stack union
    # even at scattered liveness, where the partition alone cannot pack)
    order, inv = C.compaction_order(live, pos=origin)
    n_occ, n_ao = len(occ_ds), len(ao_ds)
    all_ds = list(occ_ds) + list(ao_ds) + ([rs_d] if has_rs else [])
    planes = [origin[:, 0], origin[:, 1], origin[:, 2]]
    for d in all_ds:
        planes += [d[:, 0], d[:, 1], d[:, 2]]
    # constant caps (AO radius, bounce 1000.0) are permutation-invariant:
    # re-broadcast them after the permute instead of gathering full rows
    tcs_in = list(occ_tcs) + list(ao_tcs) + ([rs_tc] if has_rs else [])
    var_tc = [i for i, t in enumerate(tcs_in) if jnp.ndim(t) != 0]
    tcs = [jnp.asarray(tcs_in[i], jnp.float32) for i in var_tc]
    acts = list(occ_actives) + list(ao_actives) \
        + ([rs_active] if has_rs else [])
    p = C.permute_flat(planes + tcs + acts, order)
    n_s = len(all_ds)
    po = jnp.stack(p[0:3], axis=-1)
    pds = [jnp.stack(p[3 + 3 * s: 6 + 3 * s], axis=-1) for s in range(n_s)]
    pvar = p[3 + 3 * n_s: 3 + 3 * n_s + len(var_tc)]
    ptcs = [None if jnp.ndim(t) != 0 else jnp.full((r,), t, jnp.float32)
            for t in tcs_in]
    for j, i in enumerate(var_tc):
        ptcs[i] = pvar[j]
    pacts = p[3 + 3 * n_s + len(var_tc):]
    if not has_rs:
        bits, ao_ts = ctx.trace_shadow_ao_bundle(
            po, pds[:n_occ], ptcs[:n_occ], pds[n_occ:], ptcs[n_occ:],
            occ_actives=pacts[:n_occ], ao_actives=pacts[n_occ:],
            cull_mask=cull_mask)
        u = C.permute_flat([bits] + list(ao_ts), inv)
        return u[0], tuple(u[1:])
    bits, ao_ts, surf = ctx.trace_shadow_ao_resolve_bundle(
        po, pds[:n_occ], ptcs[:n_occ],
        pds[n_occ:n_occ + n_ao], ptcs[n_occ:n_occ + n_ao],
        pds[-1], ptcs[-1],
        occ_actives=pacts[:n_occ], ao_actives=pacts[n_occ:n_occ + n_ao],
        rs_active=pacts[-1], cull_mask=cull_mask)
    u = C.permute_flat([bits] + list(ao_ts), inv)
    return u[0], tuple(u[1:]), _permute_surface(surf, inv)


def _compact_trace_resolve(ctx, o, d, t_max, *, active, use_alpha,
                           cull_mask):
    """Group-compacted closest-hit + resolve (the bounce trace): live
    groups lead, parked packets exit at the root step, outputs un-permute
    back to ray order. Per-ray results unchanged."""
    from . import compaction as C

    r = o.shape[0]
    if active is None or not C.compactable(r):
        return ctx.trace_resolve(o, d, t_max, active=active,
                                 use_alpha=use_alpha, cull_mask=cull_mask)
    order, inv = C.compaction_order(active, pos=o)
    p = C.permute_flat(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         jnp.asarray(t_max, jnp.float32) + o[:, 0] * 0.0, active], order)
    surf = ctx.trace_resolve(
        jnp.stack(p[0:3], axis=-1), jnp.stack(p[3:6], axis=-1), p[6],
        active=p[7], use_alpha=use_alpha, cull_mask=cull_mask)
    return _permute_surface(surf, inv)


def shadow_visibility(
    surf: SurfaceHits,
    ctx,
    lights: Lights,
    key: jax.Array,
    samples: int,
    cull_mask: int = 0xFF,
    compact: bool = False,
) -> jax.Array:
    """Per-light soft-shadow visibility in [0,1], f32[L, R].

    Reproduces raytrace.rchit:61-116: N samples toward a sphere light
    (radius>0) or the light point; occlusion = any-hit up to the light-center
    distance; lights with cast_shadow=false are fully visible.

    ``compact``: group-compact the wavefront (ops/compaction.py) — ONE
    permutation from the union of the lights' active masks, per-light bundle
    traces on the compacted rays, and a single un-permute of the stacked
    visibility planes. Sample directions are built before the reorder, so
    results are per-ray identical.
    """
    from . import compaction as C

    r = surf.world_pos.shape[0]
    n_lights = lights.count
    # Offset shadow origins along the normal (OffsetRay analogue): G-buffer
    # positions reconstructed from quantized depth can sit slightly inside
    # curved surfaces, and un-offset origins produce shadow acne speckles.
    origin = surf.world_pos + surf.normal * 5e-3
    built_all = [_light_shadow_samples(surf, lights, li, key, samples)
                 for li in range(n_lights)]
    live = _or_actives([b[2] for b in built_all if b is not None] or [None])
    do_compact = (compact and live is not None and C.compactable(r)
                  and any(b is not None for b in built_all))
    inv = None
    if do_compact:
        order, inv = C.compaction_order(live)
        planes = [origin[:, 0], origin[:, 1], origin[:, 2]]
        lay = []   # per built light: (dir plane base, n_s)
        tails = []  # dist + active per built light
        for b in built_all:
            if b is None:
                continue
            dirs, dist, active, n_s = b
            lay.append((len(planes), n_s))
            for d in dirs:
                planes += [d[:, 0], d[:, 1], d[:, 2]]
            tails += [dist, active]
        p = C.permute_flat(planes + tails, order)
        origin = jnp.stack(p[0:3], axis=-1)
        nb = 0
        tbase = len(planes)
        for li in range(n_lights):
            if built_all[li] is None:
                continue
            base, n_s = lay[nb]
            dirs = [jnp.stack(p[base + 3 * s: base + 3 * s + 3], axis=-1)
                    for s in range(n_s)]
            built_all[li] = (dirs, p[tbase + 2 * nb], p[tbase + 2 * nb + 1],
                             n_s)
            nb += 1
    vis = []
    for li in range(n_lights):
        built = built_all[li]
        if built is None:
            vis.append(jnp.ones((r,), jnp.float32))
            continue
        dirs, dist, active, n_s = built
        # ONE origin-shared any-hit bundle traversal
        # (trace_kernel._make_bundle_kernel): the samples' footprints are
        # near-identical, so the union costs ~one wavefront per light
        bundle = getattr(ctx, "trace_occlusion_bundle", None)
        if bundle is not None:
            bits = bundle(origin, dirs, [dist] * n_s, active=active,
                          cull_mask=cull_mask)
        else:   # minimal tracer protocol (mock/legacy ctx): per-sample
            bits = jnp.zeros((r,), jnp.int32)
            for si, sdir in enumerate(dirs):
                rec = ctx.trace(origin, sdir, dist, any_hit=True,
                                active=active, cull_mask=cull_mask)
                occ = rec.hit | ~active
                bits = bits | (occ.astype(jnp.int32) << si)
        vis.append(_shadow_vis_from_bits(
            bits, active, lights.cast_shadow[li], n_s, 0))
    if inv is not None:
        vis = C.permute_flat(vis, inv)
    return jnp.stack(vis, axis=0)


def shadow_and_ao(
    surf: SurfaceHits,
    ctx,
    materials: MaterialTable,
    lights: Lights,
    shadow_key: jax.Array,
    ao_key: jax.Array,
    *,
    shadow_samples: int,
    ao_samples: int,
    ao_radius: float,
    cull_mask: int = 0xFF,
    shadow_cull_mask: int = 0xFF,
    compact: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused shadow visibility + RTAO: every light's shadow samples AND the
    AO samples originate at the same shaded surface point, so ALL of them
    ride ONE origin-shared bundle traversal (trace_kernel.trace_bundle_pallas
    mixes any-hit occlusion samples with closest-t AO samples) instead of
    one wavefront per light plus one per AO pass. Returns ``(svis f32[L,R],
    ao f32[R])`` with the exact sampling sequence of ``shadow_visibility`` +
    ``ambient_occlusion``.

    Falls back to the separate passes when the tracer has no fused bundle,
    the cull masks differ (the bundle shares one traversal mask), or the AO
    rays must honor the leaf any-hit cutout (ctx.leaf_cutout — the bundle
    kernel has no uv machinery; shadow rays are opaque either way).

    One deliberate epsilon difference vs the separate passes: the shared
    origin uses the shadow offset (normal * 5e-3) for the AO samples too
    (ambient_occlusion offsets by 1e-3), shifting AO hit distances by
    <= 4e-3 — <= 0.2% of the default 2.0 radius weight."""
    fusable = (
        getattr(ctx, "trace_shadow_ao_bundle", None) is not None
        and shadow_cull_mask == cull_mask
        and ao_samples > 0 and ao_radius > 0.0
        and not getattr(ctx, "leaf_cutout", False)
    )
    if not fusable:
        svis = shadow_visibility(surf, ctx, lights, shadow_key,
                                 shadow_samples, cull_mask=shadow_cull_mask,
                                 compact=compact)
        ao = ambient_occlusion(surf, ctx, materials, ao_key, ao_samples,
                               ao_radius, cull_mask=cull_mask,
                               compact=compact)
        return svis, ao

    r = surf.world_pos.shape[0]
    origin = surf.world_pos + surf.normal * 5e-3
    occ_ds, occ_tcs, occ_actives = [], [], []
    slots = []   # per light: None (skip) or (shift, active, n_s)
    for li in range(lights.count):
        built = _light_shadow_samples(surf, lights, li, shadow_key,
                                      shadow_samples)
        if built is None:
            slots.append(None)
            continue
        dirs, dist, active, n_s = built
        slots.append((len(occ_ds), active, n_s))
        occ_ds += dirs
        occ_tcs += [dist] * n_s
        occ_actives += [active] * n_s

    # AO sample directions: the exact ambient_occlusion sequence
    tx, ty = _default_basis(surf.normal)
    ao_ds, ao_tcs = [], []
    for si in range(ao_samples):
        k = jax.random.fold_in(ao_key, 1000 + si)
        r1, r2 = jax.random.uniform(k, (2, r))
        ao_ds.append(_cosine_sample(surf.normal, tx, ty,
                                    jnp.ones((r,)), r1, r2))
        ao_tcs.append(jnp.full((r,), ao_radius))

    if compact:
        bits, ao_ts = _compact_bundle(
            ctx, origin, occ_ds, occ_tcs, occ_actives,
            ao_ds, ao_tcs, [surf.valid] * ao_samples, cull_mask)
    else:
        bits, ao_ts = ctx.trace_shadow_ao_bundle(
            origin, occ_ds, occ_tcs, ao_ds, ao_tcs,
            occ_actives=occ_actives, ao_actives=[surf.valid] * ao_samples,
            cull_mask=cull_mask,
        )

    vis = []
    for li in range(lights.count):
        if slots[li] is None:
            vis.append(jnp.ones((r,), jnp.float32))
            continue
        shift, active, n_s = slots[li]
        vis.append(_shadow_vis_from_bits(
            bits, active, lights.cast_shadow[li], n_s, shift))
    svis = jnp.stack(vis, axis=0)

    # AO weights (rchit:205-213): occ += 1 - t/radius per hit; a miss
    # reports t == radius (weight 0), a parked lane -3e38 (masked below)
    occ = jnp.zeros((r,), jnp.float32)
    for t in ao_ts:
        occ += jnp.clip(1.0 - t / ao_radius, 0.0, 1.0)
    from .shading import lookup_material_params

    _, _, rough, metal = lookup_material_params(materials, surf.material)
    influence = (1.0 - metal) + rough * metal
    ao = jnp.clip(1.0 - occ / ao_samples, 0.0, 1.0) * influence
    ao = jnp.where(surf.valid, ao, 1.0)
    return svis, ao


def shadow_ao_bounce(
    surf: SurfaceHits,
    ctx,
    materials: MaterialTable,
    lights: Lights,
    cam_pos: jax.Array,
    shadow_key: jax.Array,
    ao_key: jax.Array,
    refl_key: jax.Array,
    *,
    params: RTParams,
) -> Tuple[jax.Array, jax.Array, Optional[SurfaceHits]]:
    """Maximally fused primary-side lighting wavefront: every light's shadow
    samples, the AO samples AND the 1-bounce reflection ray originate at the
    same surface point — ALL of them ride ONE origin-shared bundle traversal
    (trace_kernel.trace_bundle_pallas with a closest+resolve sample).
    Returns ``(svis, ao, bounce_hits | None)``; when the bounce could not be
    fused (multi-sample reflections, half-rate, leaf cutout, differing cull
    masks, or a tracer without the fused bundle) it returns ``None`` and the
    caller's ``reflections`` pass traces it as before.

    Epsilon note: the shared origin uses the shadow offset (normal * 5e-3);
    the unfused bounce offsets by 1e-3 (both are OffsetRay-analogue
    anti-acne nudges; the 4e-3 difference is far below the cosine-cone
    sampling noise of the glossy reflection itself)."""
    fuse_bounce = (
        params.fuse_bounce
        and getattr(ctx, "trace_shadow_ao_resolve_bundle", None) is not None
        and params.reflection_samples == 1
        and not params.reflection_half_rate
        and params.shadow_cull_mask == params.cull_mask
        and params.ao_samples > 0 and params.ao_radius > 0.0
        and not getattr(ctx, "leaf_cutout", False)
    )
    if not fuse_bounce:
        svis, ao = shadow_and_ao(
            surf, ctx, materials, lights, shadow_key, ao_key,
            shadow_samples=max(1, params.shadow_samples),
            ao_samples=params.ao_samples, ao_radius=params.ao_radius,
            cull_mask=params.cull_mask,
            shadow_cull_mask=params.shadow_cull_mask,
            compact=params.compact_secondary,
        )
        return svis, ao, None

    r = surf.world_pos.shape[0]
    origin = surf.world_pos + surf.normal * 5e-3
    occ_ds, occ_tcs, occ_actives = [], [], []
    slots = []
    for li in range(lights.count):
        built = _light_shadow_samples(surf, lights, li, shadow_key,
                                      max(1, params.shadow_samples))
        if built is None:
            slots.append(None)
            continue
        dirs, dist, active, n_s = built
        slots.append((len(occ_ds), active, n_s))
        occ_ds += dirs
        occ_tcs += [dist] * n_s
        occ_actives += [active] * n_s

    tx, ty = _default_basis(surf.normal)
    ao_ds, ao_tcs = [], []
    for si in range(params.ao_samples):
        k = jax.random.fold_in(ao_key, 1000 + si)
        r1, r2 = jax.random.uniform(k, (2, r))
        ao_ds.append(_cosine_sample(surf.normal, tx, ty,
                                    jnp.ones((r,)), r1, r2))
        ao_tcs.append(jnp.full((r,), params.ao_radius))

    rdir = _reflection_dir(surf, materials, cam_pos, refl_key, 0)

    if params.compact_secondary:
        bits, ao_ts, hit2 = _compact_bundle(
            ctx, origin, occ_ds, occ_tcs, occ_actives,
            ao_ds, ao_tcs, [surf.valid] * params.ao_samples,
            params.cull_mask, rs_d=rdir, rs_tc=jnp.full((r,), 1000.0),
            rs_active=surf.valid)
    else:
        bits, ao_ts, hit2 = ctx.trace_shadow_ao_resolve_bundle(
            origin, occ_ds, occ_tcs, ao_ds, ao_tcs,
            rdir, jnp.full((r,), 1000.0),
            occ_actives=occ_actives,
            ao_actives=[surf.valid] * params.ao_samples,
            rs_active=surf.valid,
            cull_mask=params.cull_mask,
        )

    vis = []
    for li in range(lights.count):
        if slots[li] is None:
            vis.append(jnp.ones((r,), jnp.float32))
            continue
        shift, active, n_s = slots[li]
        vis.append(_shadow_vis_from_bits(
            bits, active, lights.cast_shadow[li], n_s, shift))
    svis = jnp.stack(vis, axis=0)

    occ = jnp.zeros((r,), jnp.float32)
    for t in ao_ts:
        occ += jnp.clip(1.0 - t / params.ao_radius, 0.0, 1.0)
    from .shading import lookup_material_params

    _, _, rough, metal = lookup_material_params(materials, surf.material)
    influence = (1.0 - metal) + rough * metal
    ao = jnp.clip(1.0 - occ / params.ao_samples, 0.0, 1.0) * influence
    ao = jnp.where(surf.valid, ao, 1.0)
    return svis, ao, hit2


def ambient_occlusion(
    surf: SurfaceHits,
    ctx,
    materials: MaterialTable,
    key: jax.Array,
    samples: int,
    radius: float,
    cull_mask: int = 0xFF,
    compact: bool = False,
) -> jax.Array:
    """RTAO factor in [0,1] (raytrace.rchit:175-219): cosine-hemisphere rays,
    occlusion weighted by 1 - t/radius, scaled by mix(1, roughness, metallic).

    AO rays honor the any-hit cutout (the reference's ray query runs any-hit
    shaders); shadow rays deliberately do NOT (reference uses OpaqueEXT).

    ``compact``: group-compact the wavefront (ops/compaction.py) — sample
    directions are built first (RNG per ray unchanged), the occlusion sum
    accumulates in compacted order, and only the final occ plane un-permutes."""
    from . import compaction as C

    r = surf.world_pos.shape[0]
    if samples <= 0 or radius <= 0.0:
        return jnp.ones((r,), jnp.float32)
    tx, ty = _default_basis(surf.normal)
    dirs = []
    for si in range(samples):
        k = jax.random.fold_in(key, 1000 + si)
        r1, r2 = jax.random.uniform(k, (2, r))
        dirs.append(_cosine_sample(surf.normal, tx, ty, jnp.ones((r,)),
                                   r1, r2))
    o_full = surf.world_pos + surf.normal * 1e-3  # OffsetRay analogue
    valid = surf.valid
    inv = None
    if compact and C.compactable(r):
        order, inv = C.compaction_order(valid)
        planes = [o_full[:, 0], o_full[:, 1], o_full[:, 2]]
        for d in dirs:
            planes += [d[:, 0], d[:, 1], d[:, 2]]
        p = C.permute_flat(planes + [valid], order)
        o_full = jnp.stack(p[0:3], axis=-1)
        dirs = [jnp.stack(p[3 + 3 * s: 6 + 3 * s], axis=-1)
                for s in range(samples)]
        valid = p[-1]
    occ = jnp.zeros((r,), jnp.float32)
    for si in range(samples):
        d = dirs[si]
        o = o_full
        if getattr(ctx, "leaf_cutout", False):
            # trace_resolve so SceneTracer's packet kernel handles the leaf
            # any-hit cutout in-kernel (only .valid/.t are consumed)
            s2 = ctx.trace_resolve(o, d, jnp.full((r,), radius),
                                   active=valid, use_alpha=True,
                                   cull_mask=cull_mask)
            hit2, t2 = s2.valid, s2.t
        else:
            rec = ctx.trace(o, d, jnp.full((r,), radius), active=valid,
                            cull_mask=cull_mask)
            hit2, t2 = rec.hit, rec.t
        occ += jnp.where(hit2,
                         1.0 - jnp.minimum(t2, radius) / radius, 0.0)
    if inv is not None:
        occ = C.permute_flat([occ], inv)[0]
    from .shading import lookup_material_params

    _, _, rough, metal = lookup_material_params(materials, surf.material)
    influence = (1.0 - metal) + rough * metal
    ao = jnp.clip(1.0 - occ / samples, 0.0, 1.0) * influence
    return jnp.where(surf.valid, ao, 1.0)


def shade_surfaces(
    surf: SurfaceHits,
    materials: MaterialTable,
    lights: Lights,
    cam_or_prev_pos: jax.Array,  # f32[3] or f32[R, 3] — viewer position(s)
    shadow_vis: jax.Array,       # f32[L, R]
    ao: jax.Array,               # f32[R]
    textures=None,               # core.texture.TextureArrays | None
) -> jax.Array:
    """Direct lighting + ambient + emissive at hit points (rchit:48-122,
    :173-226 minus reflections). Returns f32[R, 3]; invalid rays -> 0."""
    from .shading import lookup_material_params

    albedo, emissive, roughness, metallic = lookup_material_params(
        materials, surf.material)
    tex_occ = None
    if textures is not None:
        from ..core.texture import sample_bilinear
        from .shading import lookup_texture_ids

        base_tex, emis_tex, mr_tex, occ_tex = lookup_texture_ids(
            materials, surf.material)
        albedo = albedo * sample_bilinear(textures, base_tex, surf.uv)[..., :3]
        emissive = emissive + jnp.where(
            (emis_tex >= 0)[..., None],
            sample_bilinear(textures, emis_tex, surf.uv)[..., :3], 0.0)
        mr = sample_bilinear(textures, mr_tex, surf.uv)
        roughness = roughness * jnp.where(mr_tex >= 0, mr[..., 1], 1.0)
        metallic = metallic * jnp.where(mr_tex >= 0, mr[..., 2], 1.0)
        tex_occ = jnp.where(
            occ_tex >= 0,
            sample_bilinear(textures, occ_tex, surf.uv)[..., 0], 1.0)

    view_dir = cam_or_prev_pos - surf.world_pos
    view_dir = view_dir / jnp.maximum(jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-9)

    total = jnp.zeros_like(albedo)
    for li in range(lights.count):
        contrib = point_light_contribution(
            surf.normal, view_dir, surf.world_pos,
            albedo, roughness, metallic,
            lights.position[li], lights.color[li], lights.bounds[li],
        )
        total = total + contrib * shadow_vis[li][:, None]
    ao_full = ao if tex_occ is None else ao * tex_occ
    total = total + lights.ambient[:3] * lights.ambient[3] * albedo * ao_full[:, None]
    total = total + emissive
    return jnp.where(surf.valid[:, None], total, 0.0)


def _reflection_dir(surf: SurfaceHits, materials: MaterialTable,
                    cam_pos: jax.Array, key: jax.Array, si: int) -> jax.Array:
    """Reflection-sample direction (rchit:124-146): cosine-perturbed mirror
    with cone angle roughness*(1-(1-N.V)^5). Shared by ``reflections`` and
    the fused ``shadow_ao_bounce`` so both produce the identical ray."""
    from .shading import lookup_material_params

    r = surf.world_pos.shape[0]
    _, _, rough, _ = lookup_material_params(materials, surf.material)
    v = cam_pos - surf.world_pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    n_dot_v = jnp.maximum(jnp.sum(surf.normal * v, axis=-1), 0.0)
    max_angle = rough * (1.0 - jnp.power(1.0 - n_dot_v, 5.0))
    tx, ty = _default_basis(surf.normal)
    k = jax.random.fold_in(key, 2000 + si)
    r1, r2 = jax.random.uniform(k, (2, r))
    pert_n = _cosine_sample(surf.normal, tx, ty, max_angle, r1, r2)
    return -v + 2.0 * jnp.sum(pert_n * v, axis=-1, keepdims=True) * pert_n


def reflections(
    surf: SurfaceHits,
    ctx,
    materials: MaterialTable,
    lights: Lights,
    cam_pos: jax.Array,
    key: jax.Array,
    params: RTParams,
    pretraced: Optional[SurfaceHits] = None,
) -> jax.Array:
    """1-bounce glossy reflections (rchit:124-167): cosine-perturbed mirror
    direction with cone angle roughness*(1-(1-N.V)^5); reflected hits get
    full direct lighting (with shadows + AO, depth-1 shading); misses get the
    environment color. Returns radiance to ADD, f32[R, 3].

    ``pretraced`` (from ``shadow_ao_bounce``) supplies sample 0's already-
    resolved bounce hits — the bounce ray rode the primary-side fused
    bundle, so this pass skips its own trace for that sample."""
    r = surf.world_pos.shape[0]
    if params.reflection_samples <= 0:
        return jnp.zeros((r, 3), jnp.float32)

    from .shading import lookup_material_params

    albedo, _, rough, metal = lookup_material_params(materials, surf.material)

    acc = jnp.zeros((r, 3), jnp.float32)
    for si in range(params.reflection_samples):
        k = jax.random.fold_in(key, 2000 + si)
        if si == 0 and pretraced is not None:
            hit2 = pretraced
        else:
            rdir = _reflection_dir(surf, materials, cam_pos, key, si)
            # one OffsetRay epsilon (5e-3, the shadow offset) for every
            # secondary origin: keeps the fused-bundle path (shared origin)
            # bit-comparable with this unfused path
            o = surf.world_pos + surf.normal * 5e-3
            if params.compact_secondary or params.compact_refl:
                hit2 = _compact_trace_resolve(
                    ctx, o, rdir, jnp.full((r,), 1000.0),
                    active=surf.valid, use_alpha=params.leaf_cutout,
                    cull_mask=params.cull_mask)
            else:
                hit2 = ctx.trace_resolve(o, rdir, jnp.full((r,), 1000.0),
                                         active=surf.valid,
                                         use_alpha=params.leaf_cutout,
                                         cull_mask=params.cull_mask)

        svis, ao2 = shadow_and_ao(
            hit2, ctx, materials, lights,
            jax.random.fold_in(k, 1), jax.random.fold_in(k, 2),
            shadow_samples=max(1, params.shadow_samples),
            ao_samples=params.ao_samples, ao_radius=params.ao_radius,
            cull_mask=params.cull_mask,
            shadow_cull_mask=params.shadow_cull_mask,
            compact=params.compact_secondary or params.compact_refl,
        )
        color2 = shade_surfaces(hit2, materials, lights, surf.world_pos,
                                svis, ao2, getattr(ctx, "textures", None))
        acc = acc + jnp.where(hit2.valid[:, None], color2, BACKGROUND)
    refl = acc / params.reflection_samples
    influence = jnp.clip(metal, 0.04, 1.0)[:, None]
    tint = (1.0 - metal)[:, None] + albedo * metal[:, None]  # mix(1, albedo, metal)
    return refl * influence * tint


def reflections_half_rate(
    surf: SurfaceHits,
    ctx,
    materials: MaterialTable,
    lights: Lights,
    cam_pos: jax.Array,
    key: jax.Array,
    params: RTParams,
    **_unused,
) -> jax.Array:
    """Reflections traced for every other PIXEL (flat stride 2 = x-parity in
    both row-major and tile order), reconstructed by averaging the two traced
    horizontal neighbors. Strided slices only — no gathers — and it halves
    every reflection-side cost: the bounce trace AND its secondary shadow/AO
    wavefronts. Reflections are low-frequency away from silhouette edges, so
    the 1-px reconstruction error sits below the cosine-cone noise the
    reference's own glossy sampling already carries (rchit:124-167)."""
    r = surf.world_pos.shape[0]
    assert r % 2 == 0, "half-rate reflections need an even ray count"

    def half(x):
        return x[0::2]

    surf_h = SurfaceHits(
        world_pos=half(surf.world_pos), normal=half(surf.normal),
        uv=half(surf.uv), material=half(surf.material),
        valid=half(surf.valid), t=half(surf.t),
    )
    refl_h = reflections(
        surf_h, ctx, materials, lights, cam_pos, key, params)
    right = jnp.concatenate([refl_h[1:], refl_h[-1:]], axis=0)
    odd = 0.5 * (refl_h + right)
    return jnp.stack([refl_h, odd], axis=1).reshape(r, 3)


def trace_frame(
    ctx,
    materials: MaterialTable,
    lights: Lights,
    camera: CameraMatrices,
    key: jax.Array,
    *,
    width: int,
    height: int,
    params: RTParams,
    full_width: int | None = None,
    full_height: int | None = None,
    origin=(0, 0),
) -> jax.Array:
    """Full RT frame -> HDR image f32[H, W, 3] (the RayTraceRender::render +
    rgen/rchit/rmiss pipeline as one wavefront graph). ``ctx`` is a tracer
    context (BatchTracer or accel.SceneTracer). ``origin``/``full_*`` trace a
    screen-tile window for multi-chip sharding."""
    # tile-order packets: every downstream wavefront (shadows, AO,
    # reflections) is per-ray elementwise, so only the final image needs
    # un-tiling. (Half-rate reflections use flat stride 2 = x-parity in
    # either order.)
    tiled = pick_tile(width, height)
    o, d = raygen(
        camera, width, height,
        full_width=full_width, full_height=full_height, origin=origin,
        tile_order=tiled,
    )
    r = o.shape[0]
    surf = ctx.trace_resolve(o, d, jnp.full((r,), 1000.0),
                             use_alpha=params.leaf_cutout,
                             cull_mask=params.cull_mask)

    refl_key = jax.random.fold_in(key, 7)
    svis, ao, pre_bounce = shadow_ao_bounce(
        surf, ctx, materials, lights, camera.cam_pos, key, key, refl_key,
        params=params,
    )
    color = shade_surfaces(surf, materials, lights, camera.cam_pos, svis, ao,
                           getattr(ctx, "textures", None))
    if params.reflection_half_rate and width % 2 == 0:
        refl = reflections_half_rate(
            surf, ctx, materials, lights, camera.cam_pos,
            refl_key, params, width=width, height=height,
        )
    else:
        refl = reflections(
            surf, ctx, materials, lights, camera.cam_pos,
            refl_key, params, pretraced=pre_bounce,
        )
    color = color + refl
    color = jnp.where(surf.valid[:, None], color, BACKGROUND)
    if tiled:
        return untile_image(color, width, height, tiled)
    return color.reshape(height, width, 3)
