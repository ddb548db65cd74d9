"""Pallas packet-traversal kernel for the two-level BVH.

Replaces ``vkCmdTraceRaysKHR``'s hardware traversal
(reference src/PaperRenderer/RayTrace.cpp:34-95) with a TPU-native design:

  * **Ray packets**: 1024 rays = one (8, 128) vector tile per SoA plane.
    All per-ray math (slab tests, Möller-Trumbore) is full-width VPU work.
  * **Shared scalar stack**: the packet traverses ONE node sequence — pop/
    push are scalar ops on a small carried (1, S) vector, and each step takes
    a REAL scalar branch (box / leaf / instance), so there is no lockstep
    union cost per step like the XLA path pays.
  * **SMEM-resident scene**: node boxes/inverse-matrices live in SMEM as
    f32 words and child codes as i32 words (separate arrays — no scalar
    bitcasts); leaf triangle positions + tagged prim ids likewise. A box
    step costs ~14 scalar loads + two vectorized slab tests; a leaf step
    unrolls K=8 scalar-broadcast triangle tests.
  * **Ray sorting**: callers sort rays by (direction octant, origin morton)
    so packets stay coherent — the TPU analogue of the GPU's warp-coherent
    ray scheduling.

Scenes whose node/leaf data exceeds the SMEM budget fall back to the XLA
lockstep path (ops/accel.trace_scene); paging the TLAS through SMEM is the
planned extension for 10k+-instance traced scenes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .accel import (
    _PAYLOAD_MASK, _POS, _PRIM, _TYPE_SHIFT, K, LEAF_ROW,
    HitRecord2, RTScene, TYPE_BOX, TYPE_INST, TYPE_LEAF,
)

PACKET = 1024            # rays per packet: one (8, 128) tile per plane
_SMEM_BUDGET = 700 * 1024  # bytes of SMEM we allow the scene to occupy
_STACK = 128             # kernel stack lanes (one (1, 128) i32 tile)


def pallas_traversal_ok(scene: RTScene, n_rays: int) -> bool:
    nn = scene.nodes.shape[0]
    nl = scene.leaf_rows.shape[0]
    bytes_needed = nn * 12 * 4 + nn * 2 * 4 + nl * 72 * 4 + nl * K * 4
    return (
        jax.default_backend() == "tpu"
        and bytes_needed <= _SMEM_BUDGET
        and n_rays >= PACKET
    )


def _split_scene(scene: RTScene):
    """Unified node table -> SMEM-friendly arrays.

    boxes  f32[Nn, 12]  box floats (box rows) / inverse TRS (instance rows)
    codes  i32[Nn, 2]   child codes (box rows) / [root code, self id] (inst)
    lpos   f32[Nl, 72]  K object-space triangles
    lprim  i32[Nl, K]   tagged prim ids ((slot<<24)|tri, -1 = dead)
    """
    boxes = scene.nodes[:, :12]
    codes = jax.lax.bitcast_convert_type(scene.nodes[:, 12:14], jnp.int32)
    lpos = scene.leaf_rows[:, _POS:_POS + K * 9]
    lprim = jax.lax.bitcast_convert_type(
        scene.leaf_rows[:, _PRIM:_PRIM + K], jnp.int32)
    return boxes.reshape(-1), codes.reshape(-1), lpos.reshape(-1), lprim.reshape(-1)


def _make_kernel(root_code: int, max_steps: int, any_hit: bool):
    S = _STACK

    def kernel(boxes_ref, codes_ref, lpos_ref, lprim_ref,
               o_ref, d_ref, tmax_ref,
               t_out, prim_out, inst_out, u_out, v_out):
        shape = (8, 128)
        wox, woy, woz = o_ref[0, 0], o_ref[0, 1], o_ref[0, 2]
        wdx, wdy, wdz = d_ref[0, 0], d_ref[0, 1], d_ref[0, 2]

        def safe_inv(x):
            return 1.0 / jnp.where(jnp.abs(x) < 1e-12, 1e-12, x)

        wix, wiy, wiz = safe_inv(wdx), safe_inv(wdy), safe_inv(wdz)

        best_t0 = tmax_ref[0, 0]
        neg1 = jnp.full(shape, -1, jnp.int32)
        zero = jnp.zeros(shape, jnp.float32)

        scols = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        # slot 0 pre-seeded with this pass's (static) TLAS root code
        stack0 = jnp.where(scols == 0, jnp.int32(root_code), 0)

        # carried state: scalars + the shared stack + per-ray planes
        state = (
            jnp.int32(0),                 # step counter
            jnp.int32(1),                 # sp (root pre-pushed)
            stack0,                       # (1, S) tagged codes
            best_t0, neg1, neg1, zero, zero,   # best t/prim/inst/u/v
            # object-space ray + inv (set on instance pops)
            wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz,
            jnp.int32(0),                 # cur_inst
        )

        def cond(st):
            step, sp = st[0], st[1]
            go = (sp > 0) & (step < max_steps)
            if any_hit:
                all_hit = jnp.all(st[4] >= 0)
                go &= ~all_hit
            return go

        def body(st):
            (step, sp, stack, best_t, best_prim, best_inst, best_u, best_v,
             oox, ooy, ooz, odx, ody, odz, oix, oiy, oiz, cur_inst) = st
            sp = sp - 1
            code = jnp.sum(jnp.where(scols == sp, stack, 0))
            typ = (code >> _TYPE_SHIFT) & 3
            payload = code & _PAYLOAD_MASK
            obj = ((code >> 30) & 1) == 1

            def do_box(st):
                (step, sp, stack, best_t, best_prim, best_inst, best_u,
                 best_v, oox, ooy, ooz, odx, ody, odz, oix, oiy, oiz,
                 cur_inst) = st
                b = payload * 12
                bx0, by0, bz0 = boxes_ref[b], boxes_ref[b + 1], boxes_ref[b + 2]
                bx1, by1, bz1 = boxes_ref[b + 3], boxes_ref[b + 4], boxes_ref[b + 5]
                cx0, cy0, cz0 = boxes_ref[b + 6], boxes_ref[b + 7], boxes_ref[b + 8]
                cx1, cy1, cz1 = boxes_ref[b + 9], boxes_ref[b + 10], boxes_ref[b + 11]
                px = jnp.where(obj, oox, wox)
                py = jnp.where(obj, ooy, woy)
                pz = jnp.where(obj, ooz, woz)
                ix = jnp.where(obj, oix, wix)
                iy = jnp.where(obj, oiy, wiy)
                iz = jnp.where(obj, oiz, wiz)

                def slab(lx, ly, lz, hx, hy, hz):
                    tx0 = (lx - px) * ix
                    tx1 = (hx - px) * ix
                    ty0 = (ly - py) * iy
                    ty1 = (hy - py) * iy
                    tz0 = (lz - pz) * iz
                    tz1 = (hz - pz) * iz
                    tn = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1))
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
                    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn <= best_t)
                    return hit, tn

                h0, tn0 = slab(bx0, by0, bz0, bx1, by1, bz1)
                h1, tn1 = slab(cx0, cy0, cz0, cx1, cy1, cz1)
                inf = jnp.float32(3e38)
                t0m = jnp.min(jnp.where(h0, tn0, inf))
                t1m = jnp.min(jnp.where(h1, tn1, inf))
                any0 = jnp.any(h0)
                any1 = jnp.any(h1)
                c0 = codes_ref[payload * 2]
                c1 = codes_ref[payload * 2 + 1]
                first0 = t0m <= t1m
                near_c = jnp.where(first0, c0, c1)
                far_c = jnp.where(first0, c1, c0)
                near_ok = jnp.where(first0, any0, any1)
                far_ok = jnp.where(first0, any1, any0)
                # push far then near (near pops first)
                stack = jnp.where((scols == sp) & far_ok, far_c, stack)
                sp = sp + far_ok.astype(jnp.int32)
                stack = jnp.where((scols == sp) & near_ok, near_c, stack)
                sp = sp + near_ok.astype(jnp.int32)
                return (step, sp, stack, best_t, best_prim, best_inst,
                        best_u, best_v, oox, ooy, ooz, odx, ody, odz,
                        oix, oiy, oiz, cur_inst)

            def do_inst(st):
                (step, sp, stack, best_t, best_prim, best_inst, best_u,
                 best_v, oox, ooy, ooz, odx, ody, odz, oix, oiy, oiz,
                 cur_inst) = st
                b = payload * 12
                m = [boxes_ref[b + k] for k in range(12)]
                oox = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
                ooy = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
                ooz = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
                odx = m[0] * wdx + m[1] * wdy + m[2] * wdz
                ody = m[4] * wdx + m[5] * wdy + m[6] * wdz
                odz = m[8] * wdx + m[9] * wdy + m[10] * wdz
                oix, oiy, oiz = safe_inv(odx), safe_inv(ody), safe_inv(odz)
                cur_inst = codes_ref[payload * 2 + 1]
                root = codes_ref[payload * 2]
                stack = jnp.where(scols == sp, root, stack)
                sp = sp + 1
                return (step, sp, stack, best_t, best_prim, best_inst,
                        best_u, best_v, oox, ooy, ooz, odx, ody, odz,
                        oix, oiy, oiz, cur_inst)

            def do_leaf(st):
                (step, sp, stack, best_t, best_prim, best_inst, best_u,
                 best_v, oox, ooy, ooz, odx, ody, odz, oix, oiy, oiz,
                 cur_inst) = st
                b = payload * 72
                pb = payload * K
                for k in range(K):
                    tb = b + k * 9
                    ax, ay, az = lpos_ref[tb], lpos_ref[tb + 1], lpos_ref[tb + 2]
                    bx, by, bz = lpos_ref[tb + 3], lpos_ref[tb + 4], lpos_ref[tb + 5]
                    cx, cy, cz = lpos_ref[tb + 6], lpos_ref[tb + 7], lpos_ref[tb + 8]
                    ptag = lprim_ref[pb + k]
                    e1x, e1y, e1z = bx - ax, by - ay, bz - az
                    e2x, e2y, e2z = cx - ax, cy - ay, cz - az
                    # p = d x e2 (vector planes x scalar edges)
                    px_ = ody * e2z - odz * e2y
                    py_ = odz * e2x - odx * e2z
                    pz_ = odx * e2y - ody * e2x
                    det = e1x * px_ + e1y * py_ + e1z * pz_
                    ok = jnp.abs(det) > 1e-12
                    inv = 1.0 / jnp.where(ok, det, 1.0)
                    sx, sy, sz = oox - ax, ooy - ay, ooz - az
                    u = (sx * px_ + sy * py_ + sz * pz_) * inv
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = (odx * qx + ody * qy + odz * qz) * inv
                    t = (e2x * qx + e2y * qy + e2z * qz) * inv
                    hit = (
                        ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (t > 1e-3) & (t < best_t) & (ptag >= 0)
                    )
                    best_prim = jnp.where(hit, ptag & 0x00FFFFFF, best_prim)
                    best_inst = jnp.where(hit, cur_inst, best_inst)
                    best_u = jnp.where(hit, u, best_u)
                    best_v = jnp.where(hit, v, best_v)
                    best_t = jnp.where(hit, t, best_t)
                return (step, sp, stack, best_t, best_prim, best_inst,
                        best_u, best_v, oox, ooy, ooz, odx, ody, odz,
                        oix, oiy, oiz, cur_inst)

            st2 = (step + 1, sp, stack, best_t, best_prim, best_inst,
                   best_u, best_v, oox, ooy, ooz, odx, ody, odz,
                   oix, oiy, oiz, cur_inst)
            st2 = jax.lax.cond(
                typ == TYPE_BOX, do_box,
                lambda s: jax.lax.cond(typ == TYPE_LEAF, do_leaf, do_inst, s),
                st2,
            )
            return st2

        final = jax.lax.while_loop(cond, body, state)
        best_t, best_prim, best_inst = final[3], final[4], final[5]
        best_u, best_v = final[6], final[7]
        miss = best_prim < 0
        t_out[0] = jnp.where(miss, jnp.float32(jnp.inf), best_t)
        prim_out[0] = best_prim
        inst_out[0] = jnp.where(miss, -1, best_inst)
        u_out[0] = best_u
        v_out[0] = best_v

    return kernel


def _sort_keys(o: jax.Array, d: jax.Array) -> jax.Array:
    """Coherence sort keys: direction octant (3 bits) then origin morton."""
    from .bvh import morton_codes

    octant = (
        (d[:, 0] < 0).astype(jnp.uint32) << 2
        | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
        | (d[:, 2] < 0).astype(jnp.uint32)
    )
    lo = jnp.min(o, axis=0)
    hi = jnp.max(o, axis=0)
    m = morton_codes(o, lo, hi)
    return (octant << 29) | (m >> 3)


@partial(
    jax.jit,
    static_argnames=("root_code", "stack_size", "any_hit", "sort_rays"),
)
def trace_scene_pallas(
    scene: RTScene,
    ray_o: jax.Array,
    ray_d: jax.Array,
    t_max: jax.Array,
    *,
    root_code: int,
    stack_size: int,
    any_hit: bool = False,
    active: Optional[jax.Array] = None,
    sort_rays: bool = True,
) -> HitRecord2:
    """Packet-traversal front end: pad + (optionally) coherence-sort rays,
    run the kernel per 1024-ray packet, un-sort the hit records."""
    r = ray_o.shape[0]
    r_pad = -(-r // PACKET) * PACKET
    t_cap = jnp.asarray(t_max, jnp.float32) + ray_o[:, 0] * 0.0
    if active is not None:
        t_cap = jnp.where(active, t_cap, -1.0)   # never hits, never pushes

    if sort_rays:
        order = jnp.argsort(_sort_keys(ray_o, ray_d)).astype(jnp.int32)
        o_s = ray_o[order]
        d_s = ray_d[order]
        t_s = t_cap[order]
    else:
        order = None
        o_s, d_s, t_s = ray_o, ray_d, t_cap

    def pad(x, fill):
        return jnp.pad(x, ((0, r_pad - r),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    o_s = pad(o_s, 0.0)
    d_s = pad(d_s, 1.0)
    t_s = pad(t_s, -1.0)

    g = r_pad // PACKET
    o_pk = o_s.reshape(g, 8, 128, 3).transpose(0, 3, 1, 2)
    d_pk = d_s.reshape(g, 8, 128, 3).transpose(0, 3, 1, 2)
    t_pk = t_s.reshape(g, 1, 8, 128)

    boxes, codes, lpos, lprim = _split_scene(scene)
    nn = scene.nodes.shape[0]
    nl = scene.leaf_rows.shape[0]
    max_steps = nn + nl + 64
    assert stack_size <= _STACK, "scene too deep for the packet kernel"

    kernel = _make_kernel(root_code, max_steps, any_hit)

    smem = lambda n: pl.BlockSpec(
        (n,), lambda i: (0,), memory_space=pltpu.SMEM)
    plane3 = pl.BlockSpec((1, 3, 8, 128), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    plane1 = pl.BlockSpec((1, 1, 8, 128), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    t_r, prim_r, inst_r, u_r, v_r = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            smem(boxes.shape[0]), smem(codes.shape[0]),
            smem(lpos.shape[0]), smem(lprim.shape[0]),
            plane3, plane3, plane1,
        ],
        out_specs=[out_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((g, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((g, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((g, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((g, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((g, 8, 128), jnp.float32),
        ],
    )(boxes, codes, lpos, lprim, o_pk, d_pk, t_pk)

    t_f = t_r.reshape(r_pad)[:r]
    prim_f = prim_r.reshape(r_pad)[:r]
    inst_f = inst_r.reshape(r_pad)[:r]
    u_f = u_r.reshape(r_pad)[:r]
    v_f = v_r.reshape(r_pad)[:r]
    if order is not None:
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(r, dtype=jnp.int32))
        t_f, prim_f, inst_f, u_f, v_f = (
            t_f[inv], prim_f[inv], inst_f[inv], u_f[inv], v_f[inv])
    return HitRecord2(
        t=t_f, prim=prim_f, inst=inst_f,
        bary=jnp.stack([u_f, v_f], axis=-1),
    )
