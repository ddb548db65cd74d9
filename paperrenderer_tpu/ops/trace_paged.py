"""Paged packet traversal: chunked TLAS streamed HBM->SMEM in-kernel.

The resident packet kernels (ops/trace_kernel.py) keep the whole scene in
SMEM, capping traced scenes at ~700 KiB (~3k instances). These variants keep
only the BLAS rows + the root BVH over chunk AABBs resident; the TLAS lives
in HBM as CHUNK-instance blocks (ops/accel.assemble_scene_paged) that the
kernel DMAs into SMEM scratch when traversal pops a TYPE_CHUNK code.

Correctness rests on the stack's LIFO nesting: everything pushed after a
chunk pop (its interior boxes, instance rows, and the BLAS subtrees they
open) is popped before anything pushed before it, so ONE scratch block
suffices — the chunk block stays valid for exactly its subtree, the same
invariant the instance->object-space switch already relies on.

DMA cost: ~28 KiB per chunk VISIT at ~0.1-0.3 us chained (v5e, measured in
scripts/probe_smem_dma2.py); a packet visits a handful of chunks, so paging
costs microseconds per packet against the ~100 Mrays/s budget.

Replaces: the reference's arbitrarily-sized driver TLAS
(src/PaperRenderer/AccelerationStructure.cpp:479-616) — scenes become
HBM-bound, not SMEM-bound, matching its scaling envelope on TPU terms.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .accel import (
    _PAYLOAD_MASK_P, _POS, _TYPE_SHIFT, _UV, BROWS, CHUNK,
    BCH_CODE, BCH_NODE, BCH_NRM, BCH_POS, BCH_PRIM, BCH_UV, BL_LEAVES,
    INST_ID_MASK, INST_OPAQUE_BIT, K, LOCAL_FLAG, OBJ_FLAG,
    TYPE_BOX, TYPE_CHUNK, TYPE_INST, TYPE_LEAF,
    HitRecord2, PagedScene, smat_block,
)

PACKET = 1024
_STACK = 128
_SHADE_LEAF = 1
_BF = BROWS * 12            # f32 per chunk box block (6144)
_CI = BROWS * 2             # i32 per chunk code block (1024)
_LOCAL_ROOT = (TYPE_BOX << _TYPE_SHIFT) | LOCAL_FLAG  # chunk-local row 0

# SMEM budget for the RESIDENT part (BLAS/root nodes + leaves); the TLAS no
# longer counts against it. Leaves room for the ~40 KiB of chunk scratch.
_SMEM_BUDGET = 620 * 1024

# test hook: run in the Pallas interpreter (CPU tests)
INTERPRET = False


def _pad1024(n: int) -> int:
    """In-kernel HBM->SMEM DMA wants 1024-element-multiple 1-D blocks."""
    return max(1024, -(-n // 1024) * 1024)


def _row_offsets(code, payload, ns: int, pad12: int, pad2: int,
                 has_b: bool = False):
    """Unified-table offsets for a popped code.

    The kernel keeps ONE SMEM node array: static rows at [0, ns*12), the
    current TLAS chunk block at [pad12, pad12+_BF), and (when the scene has
    chunked big-model BLASes, ``has_b``) the current BLAS chunk block at
    [pad12+_BF, +BCH_NODE) — codes likewise — so a row load is a single
    SMEM load. A local row's region is named by the code's OBJ bit: TLAS
    chunk rows are world-space, BLAS chunk rows object-space. The round-4
    dual-table form (``jnp.where(local, cb[..], sb[..])``) paid two loads
    plus a select per PLANE; this pays one or two selects per POP."""
    local = ((code >> 27) & 1) == 1
    gp = jnp.clip(payload, 0, ns - 1)
    lp = jnp.clip(payload, 0, BROWS - 1)
    if has_b:
        objb = ((code >> 30) & 1) == 1
        loc12 = jnp.where(objb, pad12 + _BF, pad12) + lp * 12
        loc2 = jnp.where(objb, pad2 + _CI, pad2) + lp * 2
    else:
        loc12 = pad12 + lp * 12
        loc2 = pad2 + lp * 2
    row12 = jnp.where(local, loc12, gp * 12)
    row2 = jnp.where(local, loc2, gp * 2)
    return row12, row2, lp, local


def _wide_box_step_paged(un, unc, flag_ref, row12, c0, c1,
                         px, py, pz, ix, iy, iz, best_t, ns,
                         pad12, pad2, has_b: bool = False):
    """4-wide grandchild box step for the paged kernel (port of
    trace_kernel._wide_box_step on the UNIFIED node table — one SMEM load
    per plane, one offset select per child row).

    Safe against the 'not-yet-resident chunk' hazard that kept the paged
    tracer binary (round-3 accel.PagedSceneTracer comment): a box-typed
    child's row lives where the CHILD's local bit says — static children
    of the root tree are static rows, chunk-interior children are rows of
    the CURRENT chunk block (LIFO-resident), and TYPE_CHUNK / TYPE_INST /
    TYPE_LEAF children are non-box, so their rows are never dereferenced
    here (the chunk DMA happens at the chunk code's own pop, exactly as in
    the binary step)."""
    inf = jnp.float32(3e38)

    def slab(b):
        lx, ly, lz = un[b], un[b + 1], un[b + 2]
        hx, hy, hz = un[b + 3], un[b + 4], un[b + 5]
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
        hit = (tf >= jnp.maximum(tn, 0.0)) & (tn <= best_t) & (lx <= hx)
        return jnp.min(jnp.where(hit, tn, inf))

    keys = []
    codes = []
    for side, cs in ((0, c0), (1, c1)):
        is_b = ((cs >> _TYPE_SHIFT) & 3) == TYPE_BOX
        crow12, crow2, _, _ = _row_offsets(
            cs, jnp.where(is_b, cs & _PAYLOAD_MASK_P, 0), ns, pad12, pad2,
            has_b)
        # box child -> its two grandchildren rows (child's table); other ->
        # the child itself with the box stored in the popped row's side
        keys.append(slab(jnp.where(is_b, crow12, row12 + side * 6)))
        codes.append(jnp.where(is_b, unc[crow2], cs))
        k1 = slab(crow12 + 6)
        keys.append(jnp.where(is_b, k1, inf))
        codes.append(unc[crow2 + 1])

    for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        a, b = keys[i], keys[j]
        ca, cb_ = codes[i], codes[j]
        sw = a > b
        keys[i] = jnp.where(sw, b, a)
        keys[j] = jnp.where(sw, a, b)
        codes[i] = jnp.where(sw, cb_, ca)
        codes[j] = jnp.where(sw, ca, cb_)

    # push order: farthest (largest finite key) first
    for k in range(4):
        e = 3 - k
        flag_ref[k] = (keys[e] < inf).astype(jnp.int32)
        flag_ref[4 + k] = codes[e]


def _wide_pushes_paged(stack_ref, flag_ref, sp, is_box, is_inst, is_chunk,
                       c0, S, inst_ok=None, chunk_root=None):
    """The 4 conditional pushes reported by ``_wide_box_step_paged``
    (instance pops push their BLAS root — gated on the instance's 8-bit
    visibility mask via ``inst_ok`` — and chunk pops the chunk-local
    root; ``chunk_root`` carries the popped chunk's OBJ bit so BLAS
    chunks re-enter in object space)."""
    box_i = is_box.astype(jnp.int32)
    for k in range(4):
        pf = flag_ref[k] * box_i
        pv = flag_ref[4 + k]
        if k == 0:
            ok = jnp.int32(1) if inst_ok is None else inst_ok
            cr = jnp.int32(_LOCAL_ROOT) if chunk_root is None else chunk_root
            pf = jnp.where(is_chunk, 1, jnp.where(is_inst, ok, pf))
            pv = jnp.where(is_chunk, cr,
                           jnp.where(is_inst, c0, pv))
        stack_ref[jnp.where(pf == 1, jnp.minimum(sp, S - 1), S)] = pv
        sp = sp + pf
    return sp


def paged_traversal_ok(scene: PagedScene, n_rays: int) -> bool:
    ns = scene.static_nodes.shape[0]
    nl = scene.leaf_rows.shape[0]
    resident = ns * 12 * 4 + ns * 2 * 4 + nl * 72 * 4 + nl * K * 4
    if scene.bch_codes.shape[0]:
        # BLAS-chunk scratch regions (nodes+codes+leaf pos+prim)
        resident += (BCH_NODE + BCH_POS) * 4 + (BCH_CODE + BCH_PRIM) * 4
    return (
        jax.default_backend() == "tpu"
        and resident <= _SMEM_BUDGET
        and n_rays >= PACKET
    )


def paged_resolve_ok(scene: PagedScene, n_rays: int) -> bool:
    ns = scene.static_nodes.shape[0]
    nl = scene.leaf_rows.shape[0]
    resident = (ns * 12 * 4 + ns * 2 * 4 + nl * 72 * 4 + nl * K * 4
                + nl * (48 + 72) * 4)
    if scene.bch_codes.shape[0]:
        resident += ((BCH_NODE + BCH_POS + BCH_UV + BCH_NRM) * 4
                     + (BCH_CODE + BCH_PRIM) * 4)
    return (
        jax.default_backend() == "tpu"
        and resident <= _SMEM_BUDGET
        and n_rays >= PACKET
    )


def _split_static(scene: PagedScene):
    sb = scene.static_nodes.reshape(-1)
    sc = scene.static_codes.reshape(-1)
    lpos = scene.leaf_rows[:, _POS:_UV].reshape(-1)
    lprim = scene.leaf_prim.reshape(-1)
    return sb, sc, lpos, lprim


def _make_kernel_paged(root_code: int, max_steps: int, any_hit: bool,
                       ns: int, pad12: int, pad2: int,
                       nbc: int = 0, lpad_pos: int = 0, lpad_prim: int = 0,
                       image_mode: bool = False, wide: bool = False,
                       debug_steps: bool = False, cull_mask: int = 0xFF,
                       pack: int = 1):
    """Paged closest/any-hit packet kernel (mirror of trace_kernel._make_kernel
    with the chunk-DMA branch) on the UNIFIED node table: static rows are
    DMA'd HBM->SMEM once at grid step 0 into [0, ns*12) of one scratch
    array, the current chunk block lives at [pad12, pad12+_BF) of the same
    array — every plane load is a single SMEM load (round-5: the dual-table
    select form cost ~2x the scalar work per box step). ``wide`` swaps in
    the 4-wide grandchild box step (_wide_box_step_paged)."""
    from .trace_kernel import _io_helpers

    S = _STACK
    rd, stv = _io_helpers(image_mode)
    V = (8 * pack, 128)      # packet vector shape (pack sub-blocks, one stack)
    FI = 8 if wide else 3    # flag slot: current instance id
    FH = 9 if wide else 4    # flag slot: all-rays-hit (any-hit early exit)

    has_b = nbc > 0

    def kernel(*refs):
        (sb_hbm, sc_hbm, lpos_in, lprim_in, cbox_hbm, ccode_hbm), refs = \
            refs[:6], refs[6:]
        if has_b:
            (bnodes_hbm, bcodes_hbm, blpos_hbm, blprim_hbm), refs = \
                refs[:4], refs[4:]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
         t_out, prim_out, inst_out, u_out, v_out,
         obj_ref, best_ref, flag_ref, un, unc), refs = refs[:17], refs[17:]
        if has_b:
            (ulp, ulpr), refs = refs[:2], refs[2:]
        else:
            ulp, ulpr = lpos_in, lprim_in   # SMEM inputs (no leaf paging)
        sems, stack_ref = refs

        @pl.when(pl.program_id(0) == 0)
        def _load_static():
            ds = [
                pltpu.make_async_copy(
                    sb_hbm, un.at[pl.ds(0, pad12)], sems.at[2]),
                pltpu.make_async_copy(
                    sc_hbm, unc.at[pl.ds(0, pad2)], sems.at[3]),
            ]
            if has_b:
                ds.append(pltpu.make_async_copy(
                    lpos_in, ulp.at[pl.ds(0, lpad_pos)], sems.at[4]))
                ds.append(pltpu.make_async_copy(
                    lprim_in, ulpr.at[pl.ds(0, lpad_prim)], sems.at[5]))
            for d in ds:
                d.start()
            for d in ds:
                d.wait()

        wox, woy, woz = rd(ox_ref, 0), rd(oy_ref, 0), rd(oz_ref, 0)
        wdx, wdy, wdz = rd(dx_ref, 0), rd(dy_ref, 0), rd(dz_ref, 0)

        def safe_inv(x):
            return 1.0 / jnp.where(jnp.abs(x) < 1e-12, 1e-12, x)

        wix, wiy, wiz = safe_inv(wdx), safe_inv(wdy), safe_inv(wdz)

        neg1 = pltpu.bitcast(jnp.full(V, -1, jnp.int32), jnp.float32)
        # ratio winner state (see trace_kernel._make_kernel): [0]=t num,
        # [3]/[4]=u/v num, [6]=|det| den (1.0 = none), [5]=prune t plane
        best_ref[0] = rd(tmax_ref, 0)
        best_ref[1] = neg1
        best_ref[2] = neg1
        best_ref[3] = jnp.zeros(V, jnp.float32)
        best_ref[4] = jnp.zeros(V, jnp.float32)
        # [5] = box-test prune bound: any-hit drops committed rays to -3e38
        best_ref[5] = rd(tmax_ref, 0)
        best_ref[6] = jnp.ones(V, jnp.float32)
        for i, v in enumerate((wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz)):
            obj_ref[i] = v
        flag_ref[FI] = jnp.int32(0)   # cur_inst
        flag_ref[FH] = jnp.int32(0)   # all-hit (any_hit early exit)
        if debug_steps:
            flag_ref[FH + 1] = jnp.int32(0)   # chunk-pop counter
            flag_ref[FH + 2] = jnp.int32(0)   # leaf | inst<<11 pop counts

        # SMEM scalar stack (see trace_kernel._make_kernel): slot S = trash
        stack_ref[0] = jnp.int32(root_code)

        def cond(st):
            step, sp, done = st
            return (sp > 0) & (step < max_steps) & (done == 0)

        def body(st):
            step, sp, done = st
            sp = sp - 1
            code = stack_ref[sp]
            typ = (code >> _TYPE_SHIFT) & 3
            payload = code & _PAYLOAD_MASK_P
            obj = ((code >> 30) & 1) == 1
            is_box = typ == TYPE_BOX
            is_leaf = typ == TYPE_LEAF
            is_inst = typ == TYPE_INST
            is_chunk = typ == TYPE_CHUNK

            row12, row2, lp, local = _row_offsets(
                code, payload, ns, pad12, pad2, has_b)
            c0 = unc[row2]
            c1 = unc[row2 + 1]
            # instance record word c1 = [mask:8 | opaque:1 | id:23]
            inst_ok = (((c1 >> 24) & cull_mask) != 0).astype(jnp.int32)

            @pl.when(is_chunk & jnp.logical_not(obj))
            def _chunk():
                cpay = jnp.clip(payload, 0,
                                cbox_hbm.shape[0] // _BF - 1)
                d0 = pltpu.make_async_copy(
                    cbox_hbm.at[pl.ds(cpay * _BF, _BF)],
                    un.at[pl.ds(pad12, _BF)], sems.at[0])
                d1 = pltpu.make_async_copy(
                    ccode_hbm.at[pl.ds(cpay * _CI, _CI)],
                    unc.at[pl.ds(pad2, _CI)], sems.at[1])
                d0.start()
                d1.start()
                d0.wait()
                d1.wait()
                if debug_steps:
                    flag_ref[FH + 1] = flag_ref[FH + 1] + 1

            if has_b:
                @pl.when(is_chunk & obj)
                def _bchunk():
                    # big-model BLAS chunk: nodes/codes into the BLAS region,
                    # its leaf rows into the paged leaf regions (LIFO: one
                    # block suffices — the chunk's subtree completes before
                    # any other BLAS chunk pops)
                    bp = jnp.clip(payload, 0, nbc - 1)
                    ds = [
                        pltpu.make_async_copy(
                            bnodes_hbm.at[pl.ds(bp * BCH_NODE, BCH_NODE)],
                            un.at[pl.ds(pad12 + _BF, BCH_NODE)], sems.at[6]),
                        pltpu.make_async_copy(
                            bcodes_hbm.at[pl.ds(bp * BCH_CODE, BCH_CODE)],
                            unc.at[pl.ds(pad2 + _CI, BCH_CODE)], sems.at[7]),
                        pltpu.make_async_copy(
                            blpos_hbm.at[pl.ds(bp * BCH_POS, BCH_POS)],
                            ulp.at[pl.ds(lpad_pos, BCH_POS)], sems.at[8]),
                        pltpu.make_async_copy(
                            blprim_hbm.at[pl.ds(bp * BCH_PRIM, BCH_PRIM)],
                            ulpr.at[pl.ds(lpad_prim, BCH_PRIM)], sems.at[9]),
                    ]
                    for d in ds:
                        d.start()
                    for d in ds:
                        d.wait()

            if debug_steps:
                # pack (leaf | inst<<11) pop counts in one slot
                flag_ref[FH + 2] = (
                    flag_ref[FH + 2] + is_leaf.astype(jnp.int32)
                    + (is_inst.astype(jnp.int32) << 11))

            @pl.when(is_box)
            def _box():
                best_t = best_ref[5]
                # one scalar-predicate select per plane (the old
                # obj_f*a + (1-obj_f)*b lerp cost 3 vector ops per plane)
                px = jnp.where(obj, obj_ref[0], wox)
                py = jnp.where(obj, obj_ref[1], woy)
                pz = jnp.where(obj, obj_ref[2], woz)
                ix = jnp.where(obj, obj_ref[6], wix)
                iy = jnp.where(obj, obj_ref[7], wiy)
                iz = jnp.where(obj, obj_ref[8], wiz)
                if wide:
                    _wide_box_step_paged(
                        un, unc, flag_ref, row12, c0, c1,
                        px, py, pz, ix, iy, iz, best_t, ns, pad12, pad2,
                        has_b)
                    return

                def ld(o):
                    return un[row12 + o]

                def slab(o6):
                    lx, ly, lz = ld(o6), ld(o6 + 1), ld(o6 + 2)
                    hx, hy, hz = ld(o6 + 3), ld(o6 + 4), ld(o6 + 5)
                    tx0 = (lx - px) * ix
                    tx1 = (hx - px) * ix
                    ty0 = (ly - py) * iy
                    ty1 = (hy - py) * iy
                    tz0 = (lz - pz) * iz
                    tz1 = (hz - pz) * iz
                    tn = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1))
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
                    hit = ((tf >= jnp.maximum(tn, 0.0)) & (tn <= best_t)
                           & (lx <= hx))
                    return hit, tn

                h0, tn0 = slab(0)
                h1, tn1 = slab(6)
                inf = jnp.float32(3e38)
                t0m = jnp.min(jnp.where(h0, tn0, inf))
                t1m = jnp.min(jnp.where(h1, tn1, inf))
                # any(h) == (min entry < inf): hit lanes satisfy tn <= best_t
                # <= t_max << 3e38, so the two any() cross-lane reductions
                # fold into the min-reductions already needed for ordering
                flag_ref[0] = (t0m < inf).astype(jnp.int32)
                flag_ref[1] = (t1m < inf).astype(jnp.int32)
                flag_ref[2] = (t0m <= t1m).astype(jnp.int32)

            @pl.when(is_inst)
            def _inst():
                # instance rows live ONLY in chunk blocks (always local)
                m = [un[row12 + k] for k in range(12)]
                oox = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
                ooy = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
                ooz = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
                odx = m[0] * wdx + m[1] * wdy + m[2] * wdz
                ody = m[4] * wdx + m[5] * wdy + m[6] * wdz
                odz = m[8] * wdx + m[9] * wdy + m[10] * wdz
                obj_ref[0] = oox
                obj_ref[1] = ooy
                obj_ref[2] = ooz
                obj_ref[3] = odx
                obj_ref[4] = ody
                obj_ref[5] = odz
                obj_ref[6] = safe_inv(odx)
                obj_ref[7] = safe_inv(ody)
                obj_ref[8] = safe_inv(odz)
                flag_ref[FI] = c1    # global instance slot id

            @pl.when(is_leaf)
            def _leaf():
                if has_b:
                    # local leaf rows live in the paged BLAS-chunk region
                    lb = jnp.clip(payload, 0, BL_LEAVES - 1)
                    b = jnp.where(local, lpad_pos + lb * 72, payload * 72)
                    pb = jnp.where(local, lpad_prim + lb * K, payload * K)
                else:
                    b = payload * 72
                    pb = payload * K
                oox, ooy, ooz = obj_ref[0], obj_ref[1], obj_ref[2]
                odx, ody, odz = obj_ref[3], obj_ref[4], obj_ref[5]
                num_b = best_ref[0]
                den_b = best_ref[6]
                best_prim = pltpu.bitcast(best_ref[1], jnp.int32)
                best_u = best_ref[3]
                best_v = best_ref[4]
                best_inst = pltpu.bitcast(best_ref[2], jnp.int32)
                cur_inst = flag_ref[FI] & INST_ID_MASK
                for k in range(K):
                    tb = b + k * 9
                    # leaf rows store (a, e1, e2) — edges read directly
                    ax, ay, az = (ulp[tb], ulp[tb + 1],
                                  ulp[tb + 2])
                    e1x, e1y, e1z = (ulp[tb + 3], ulp[tb + 4],
                                     ulp[tb + 5])
                    e2x, e2y, e2z = (ulp[tb + 6], ulp[tb + 7],
                                     ulp[tb + 8])
                    ptag = ulpr[pb + k]
                    px_ = ody * e2z - odz * e2y
                    py_ = odz * e2x - odx * e2z
                    pz_ = odx * e2y - ody * e2x
                    det = e1x * px_ + e1y * py_ + e1z * pz_
                    # division-free Möller-Trumbore (see trace_kernel._leaf)
                    s = jnp.where(det >= 0.0, 1.0, -1.0)
                    adet = jnp.abs(det)
                    ok = adet > 1e-12
                    sx, sy, sz = oox - ax, ooy - ay, ooz - az
                    du = (sx * px_ + sy * py_ + sz * pz_) * s
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    dv = (odx * qx + ody * qy + odz * qz) * s
                    dt = (e2x * qx + e2y * qy + e2z * qz) * s
                    hit = (
                        ok & (du >= 0.0) & (dv >= 0.0) & (du + dv <= adet)
                        & (dt > 1e-3 * adet) & (dt * den_b < num_b * adet)
                        & (ptag >= 0)
                    )
                    best_prim = jnp.where(hit, ptag & 0x00FFFFFF, best_prim)
                    best_inst = jnp.where(hit, cur_inst, best_inst)
                    best_u = jnp.where(hit, du, best_u)
                    best_v = jnp.where(hit, dv, best_v)
                    num_b = jnp.where(hit, dt, num_b)
                    den_b = jnp.where(hit, adet, den_b)
                best_ref[0] = num_b
                best_ref[6] = den_b
                best_ref[1] = pltpu.bitcast(best_prim, jnp.float32)
                best_ref[2] = pltpu.bitcast(best_inst, jnp.float32)
                best_ref[3] = best_u
                best_ref[4] = best_v
                # ONE divide per leaf step refreshes the box-test prune plane
                best_t = num_b / den_b
                if any_hit:
                    # committed rays stop contributing to box tests entirely
                    best_ref[5] = jnp.where(best_prim >= 0,
                                            jnp.float32(-3e38), best_t)
                    flag_ref[FH] = jnp.all(best_prim >= 0).astype(jnp.int32)
                else:
                    best_ref[5] = best_t

            if wide:
                sp = _wide_pushes_paged(
                    stack_ref, flag_ref, sp, is_box, is_inst, is_chunk, c0,
                    S, inst_ok,
                    jnp.int32(_LOCAL_ROOT) | (code & jnp.int32(OBJ_FLAG)))
            else:
                box_i = is_box.astype(jnp.int32)
                any0 = flag_ref[0] * box_i
                any1 = flag_ref[1] * box_i
                first0 = flag_ref[2]
                near_c = jnp.where(first0 == 1, c0, c1)
                far_c = jnp.where(first0 == 1, c1, c0)
                near_ok = jnp.where(first0 == 1, any0, any1)
                far_ok = jnp.where(first0 == 1, any1, any0)
                # instance pushes its BLAS root (c0) if mask-visible; chunk
                # pushes the chunk-local root; box pushes far then near
                p1 = jnp.where(is_chunk, 1,
                               jnp.where(is_inst, inst_ok, far_ok))
                chunk_root = jnp.int32(_LOCAL_ROOT) | (
                    code & jnp.int32(OBJ_FLAG))
                p1_val = jnp.where(is_chunk, chunk_root,
                                   jnp.where(is_inst, c0, far_c))
                stack_ref[
                    jnp.where(p1 == 1, jnp.minimum(sp, S - 1), S)] = p1_val
                sp = sp + p1
                stack_ref[
                    jnp.where(near_ok == 1, jnp.minimum(sp, S - 1), S)
                ] = near_c
                sp = sp + near_ok
            done = flag_ref[FH] if any_hit else jnp.int32(0)
            return step + 1, sp, done

        fin = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(1), jnp.int32(0)))

        # the winner is carried as (numerator, |det|) — divide ONCE per ray
        inv_den = 1.0 / best_ref[6]
        best_t = best_ref[0] * inv_den
        best_prim = pltpu.bitcast(best_ref[1], jnp.int32)
        best_inst = pltpu.bitcast(best_ref[2], jnp.int32)
        miss = best_prim < 0
        stv(t_out, 0, jnp.where(miss, jnp.float32(jnp.inf), best_t))
        stv(prim_out, 0, best_prim)
        stv(inst_out, 0, jnp.where(miss, -1, best_inst))
        if debug_steps:
            stv(u_out, 0,
                jnp.full(V, fin[0], jnp.int32).astype(jnp.float32))
            stv(v_out, 0, jnp.full(V, flag_ref[FH + 2],
                                   jnp.int32).astype(jnp.float32))
        else:
            stv(u_out, 0, best_ref[3] * inv_den)
            stv(v_out, 0, best_ref[4] * inv_den)

    return kernel


def _make_resolve_kernel_paged(root_code: int, max_steps: int, n_slots: int,
                               ns: int, pad12: int, pad2: int,
                               nbc: int = 0, lpad_pos: int = 0,
                               lpad_prim: int = 0, lpad_uv: int = 0,
                               lpad_nrm: int = 0,
                               alpha_test: bool = False, n_mats: int = 1,
                               image_mode: bool = False, wide: bool = False,
                               cull_mask: int = 0xFF, pack: int = 1):
    """Paged fused trace+resolve kernel (mirror of
    trace_kernel._make_resolve_kernel) on the UNIFIED node table (see
    _make_kernel_paged). Hit attributes interpolate at hit
    time from SMEM leaf tables; the material id comes from the CURRENT
    CHUNK's slot table (DMA'd with the block), so slot_materials never
    needs global SMEM residency."""
    from .trace_kernel import _io_helpers

    S = _STACK
    sblk = smat_block(n_slots)
    rd, stv = _io_helpers(image_mode)
    V = (8 * pack, 128)      # packet vector shape (pack sub-blocks, one stack)
    FI = 8 if wide else 3    # flag slot: current instance id
    FLI = 10 if wide else 5  # flag slot: current chunk-local instance k

    has_b = nbc > 0

    def kernel(*refs):
        (sb_hbm, sc_hbm, lpos_in, lprim_in, luv_in, lnrm_in,
         cbox_hbm, ccode_hbm, csmat_hbm), refs = refs[:9], refs[9:]
        if has_b:
            (bnodes_hbm, bcodes_hbm, blpos_hbm, blprim_hbm, bluv_hbm,
             blnrm_hbm), refs = refs[:6], refs[6:]
        if alpha_test:
            smodel_ref = refs[0]
            refs = refs[1:]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
         t_out, prim_out, inst_out, uvx_out, uvy_out,
         nx_out, ny_out, nz_out, mat_out,
         obj_ref, best_ref, flag_ref, minv_ref, un, unc, cs), refs = \
            refs[:23], refs[23:]
        if has_b:
            (ulp, ulpr, uuv, unr), refs = refs[:4], refs[4:]
        else:
            ulp, ulpr, uuv, unr = lpos_in, lprim_in, luv_in, lnrm_in
        sems, stack_ref = refs

        @pl.when(pl.program_id(0) == 0)
        def _load_static():
            ds = [
                pltpu.make_async_copy(
                    sb_hbm, un.at[pl.ds(0, pad12)], sems.at[3]),
                pltpu.make_async_copy(
                    sc_hbm, unc.at[pl.ds(0, pad2)], sems.at[4]),
            ]
            if has_b:
                ds.append(pltpu.make_async_copy(
                    lpos_in, ulp.at[pl.ds(0, lpad_pos)], sems.at[5]))
                ds.append(pltpu.make_async_copy(
                    lprim_in, ulpr.at[pl.ds(0, lpad_prim)], sems.at[6]))
                ds.append(pltpu.make_async_copy(
                    luv_in, uuv.at[pl.ds(0, lpad_uv)], sems.at[7]))
                ds.append(pltpu.make_async_copy(
                    lnrm_in, unr.at[pl.ds(0, lpad_nrm)], sems.at[8]))
            for d in ds:
                d.start()
            for d in ds:
                d.wait()

        wox, woy, woz = rd(ox_ref, 0), rd(oy_ref, 0), rd(oz_ref, 0)
        wdx, wdy, wdz = rd(dx_ref, 0), rd(dy_ref, 0), rd(dz_ref, 0)

        def safe_inv(x):
            return 1.0 / jnp.where(jnp.abs(x) < 1e-12, 1e-12, x)

        wix, wiy, wiz = safe_inv(wdx), safe_inv(wdy), safe_inv(wdz)

        neg1 = pltpu.bitcast(jnp.full(V, -1, jnp.int32), jnp.float32)
        # ratio winner state (see trace_kernel._make_resolve_kernel):
        # [0]=t num, [3..7]=uv/normal numerators, [9]=|det| den, [10]=prune t
        best_ref[0] = rd(tmax_ref, 0)
        best_ref[1] = neg1
        best_ref[2] = neg1
        for i in range(3, 8):
            best_ref[i] = jnp.zeros(V, jnp.float32)
        best_ref[8] = pltpu.bitcast(
            jnp.zeros(V, jnp.int32), jnp.float32)
        best_ref[9] = jnp.ones(V, jnp.float32)
        best_ref[10] = rd(tmax_ref, 0)
        for i, v in enumerate((wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz)):
            obj_ref[i] = v
        flag_ref[FI] = jnp.int32(0)   # cur_inst (global slot)
        flag_ref[FLI] = jnp.int32(0)  # cur chunk-local instance k
        for i in range(12):
            minv_ref[i] = jnp.float32(1.0 if i in (0, 5, 10) else 0.0)

        # SMEM scalar stack (see trace_kernel._make_kernel): slot S = trash
        stack_ref[0] = jnp.int32(root_code)

        def cond(st):
            step, sp = st
            return (sp > 0) & (step < max_steps)

        def body(st):
            step, sp = st
            sp = sp - 1
            code = stack_ref[sp]
            typ = (code >> _TYPE_SHIFT) & 3
            payload = code & _PAYLOAD_MASK_P
            obj = ((code >> 30) & 1) == 1
            is_box = typ == TYPE_BOX
            is_leaf = typ == TYPE_LEAF
            is_inst = typ == TYPE_INST
            is_chunk = typ == TYPE_CHUNK

            row12, row2, lp, local = _row_offsets(
                code, payload, ns, pad12, pad2, has_b)
            c0 = unc[row2]
            c1 = unc[row2 + 1]
            # instance record word c1 = [mask:8 | opaque:1 | id:23]
            inst_ok = (((c1 >> 24) & cull_mask) != 0).astype(jnp.int32)

            @pl.when(is_chunk & jnp.logical_not(obj))
            def _chunk():
                cpay = jnp.clip(payload, 0, cbox_hbm.shape[0] // _BF - 1)
                d0 = pltpu.make_async_copy(
                    cbox_hbm.at[pl.ds(cpay * _BF, _BF)],
                    un.at[pl.ds(pad12, _BF)], sems.at[0])
                d1 = pltpu.make_async_copy(
                    ccode_hbm.at[pl.ds(cpay * _CI, _CI)],
                    unc.at[pl.ds(pad2, _CI)], sems.at[1])
                d2 = pltpu.make_async_copy(
                    csmat_hbm.at[pl.ds(cpay * sblk, sblk)], cs, sems.at[2])
                d0.start()
                d1.start()
                d2.start()
                d0.wait()
                d1.wait()
                d2.wait()

            if has_b:
                @pl.when(is_chunk & obj)
                def _bchunk():
                    # big-model BLAS chunk (see _make_kernel_paged._bchunk)
                    bp = jnp.clip(payload, 0, nbc - 1)
                    ds = [
                        pltpu.make_async_copy(
                            bnodes_hbm.at[pl.ds(bp * BCH_NODE, BCH_NODE)],
                            un.at[pl.ds(pad12 + _BF, BCH_NODE)], sems.at[9]),
                        pltpu.make_async_copy(
                            bcodes_hbm.at[pl.ds(bp * BCH_CODE, BCH_CODE)],
                            unc.at[pl.ds(pad2 + _CI, BCH_CODE)],
                            sems.at[10]),
                        pltpu.make_async_copy(
                            blpos_hbm.at[pl.ds(bp * BCH_POS, BCH_POS)],
                            ulp.at[pl.ds(lpad_pos, BCH_POS)], sems.at[11]),
                        pltpu.make_async_copy(
                            blprim_hbm.at[pl.ds(bp * BCH_PRIM, BCH_PRIM)],
                            ulpr.at[pl.ds(lpad_prim, BCH_PRIM)],
                            sems.at[12]),
                        pltpu.make_async_copy(
                            bluv_hbm.at[pl.ds(bp * BCH_UV, BCH_UV)],
                            uuv.at[pl.ds(lpad_uv, BCH_UV)], sems.at[13]),
                        pltpu.make_async_copy(
                            blnrm_hbm.at[pl.ds(bp * BCH_NRM, BCH_NRM)],
                            unr.at[pl.ds(lpad_nrm, BCH_NRM)], sems.at[14]),
                    ]
                    for d in ds:
                        d.start()
                    for d in ds:
                        d.wait()

            @pl.when(is_box)
            def _box():
                best_t = best_ref[10]
                # one scalar-predicate select per plane (the old
                # obj_f*a + (1-obj_f)*b lerp cost 3 vector ops per plane)
                px = jnp.where(obj, obj_ref[0], wox)
                py = jnp.where(obj, obj_ref[1], woy)
                pz = jnp.where(obj, obj_ref[2], woz)
                ix = jnp.where(obj, obj_ref[6], wix)
                iy = jnp.where(obj, obj_ref[7], wiy)
                iz = jnp.where(obj, obj_ref[8], wiz)
                if wide:
                    _wide_box_step_paged(
                        un, unc, flag_ref, row12, c0, c1,
                        px, py, pz, ix, iy, iz, best_t, ns, pad12, pad2,
                        has_b)
                    return

                def ld(o):
                    return un[row12 + o]

                def slab(o6):
                    lx, ly, lz = ld(o6), ld(o6 + 1), ld(o6 + 2)
                    hx, hy, hz = ld(o6 + 3), ld(o6 + 4), ld(o6 + 5)
                    tx0 = (lx - px) * ix
                    tx1 = (hx - px) * ix
                    ty0 = (ly - py) * iy
                    ty1 = (hy - py) * iy
                    tz0 = (lz - pz) * iz
                    tz1 = (hz - pz) * iz
                    tn = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1))
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
                    hit = ((tf >= jnp.maximum(tn, 0.0)) & (tn <= best_t)
                           & (lx <= hx))
                    return hit, tn

                h0, tn0 = slab(0)
                h1, tn1 = slab(6)
                inf = jnp.float32(3e38)
                t0m = jnp.min(jnp.where(h0, tn0, inf))
                t1m = jnp.min(jnp.where(h1, tn1, inf))
                # any(h) == (min entry < inf): hit lanes satisfy tn <= best_t
                # <= t_max << 3e38, so the two any() cross-lane reductions
                # fold into the min-reductions already needed for ordering
                flag_ref[0] = (t0m < inf).astype(jnp.int32)
                flag_ref[1] = (t1m < inf).astype(jnp.int32)
                flag_ref[2] = (t0m <= t1m).astype(jnp.int32)

            @pl.when(is_inst)
            def _inst():
                m = [un[row12 + k] for k in range(12)]
                oox = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
                ooy = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
                ooz = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
                odx = m[0] * wdx + m[1] * wdy + m[2] * wdz
                ody = m[4] * wdx + m[5] * wdy + m[6] * wdz
                odz = m[8] * wdx + m[9] * wdy + m[10] * wdz
                obj_ref[0] = oox
                obj_ref[1] = ooy
                obj_ref[2] = ooz
                obj_ref[3] = odx
                obj_ref[4] = ody
                obj_ref[5] = odz
                obj_ref[6] = safe_inv(odx)
                obj_ref[7] = safe_inv(ody)
                obj_ref[8] = safe_inv(odz)
                flag_ref[FI] = c1
                flag_ref[FLI] = lp - (CHUNK - 1)
                for k in range(12):
                    minv_ref[k] = m[k]

            @pl.when(is_leaf)
            def _leaf():
                if has_b:
                    # local leaf rows live in the paged BLAS-chunk regions
                    lb = jnp.clip(payload, 0, BL_LEAVES - 1)
                    b = jnp.where(local, lpad_pos + lb * 72, payload * 72)
                    ub = jnp.where(local, lpad_uv + lb * 48, payload * 48)
                    nb = jnp.where(local, lpad_nrm + lb * 72, payload * 72)
                    pb = jnp.where(local, lpad_prim + lb * K, payload * K)
                else:
                    b = payload * 72
                    ub = payload * 48
                    nb = payload * 72
                    pb = payload * K
                oox, ooy, ooz = obj_ref[0], obj_ref[1], obj_ref[2]
                odx, ody, odz = obj_ref[3], obj_ref[4], obj_ref[5]
                best_prim = pltpu.bitcast(best_ref[1], jnp.int32)
                best_inst = pltpu.bitcast(best_ref[2], jnp.int32)
                best_uvx = best_ref[3]
                best_uvy = best_ref[4]
                best_nx = best_ref[5]
                best_ny = best_ref[6]
                best_nz = best_ref[7]
                best_mat = pltpu.bitcast(best_ref[8], jnp.int32)
                num_b = best_ref[0]
                den_b = best_ref[9]
                cur_raw = flag_ref[FI]
                cur_inst = cur_raw & INST_ID_MASK
                cur_li = flag_ref[FLI]
                m = [minv_ref[k] for k in range(12)]
                for k in range(K):
                    tb = b + k * 9
                    # leaf rows store (a, e1, e2) — edges read directly
                    ax, ay, az = (ulp[tb], ulp[tb + 1],
                                  ulp[tb + 2])
                    e1x, e1y, e1z = (ulp[tb + 3], ulp[tb + 4],
                                     ulp[tb + 5])
                    e2x, e2y, e2z = (ulp[tb + 6], ulp[tb + 7],
                                     ulp[tb + 8])
                    ptag = ulpr[pb + k]
                    px_ = ody * e2z - odz * e2y
                    py_ = odz * e2x - odx * e2z
                    pz_ = odx * e2y - ody * e2x
                    det = e1x * px_ + e1y * py_ + e1z * pz_
                    # division-free Möller-Trumbore, ratio-space attribute
                    # interpolation (see trace_kernel._make_resolve_kernel)
                    s = jnp.where(det >= 0.0, 1.0, -1.0)
                    adet = jnp.abs(det)
                    ok = adet > 1e-12
                    sx, sy, sz = oox - ax, ooy - ay, ooz - az
                    du = (sx * px_ + sy * py_ + sz * pz_) * s
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    dv = (odx * qx + ody * qy + odz * qz) * s
                    dt = (e2x * qx + e2y * qy + e2z * qz) * s
                    hit = (
                        ok & (du >= 0.0) & (dv >= 0.0) & (du + dv <= adet)
                        & (dt > 1e-3 * adet) & (dt * den_b < num_b * adet)
                        & (ptag >= 0)
                    )
                    dw0 = adet - du - dv
                    kb = ub + k * 6
                    uvx = (dw0 * uuv[kb] + du * uuv[kb + 2]
                           + dv * uuv[kb + 4])
                    uvy = (dw0 * uuv[kb + 1] + du * uuv[kb + 3]
                           + dv * uuv[kb + 5])
                    kn = nb + k * 9
                    n0x, n0y, n0z = (unr[kn], unr[kn + 1],
                                     unr[kn + 2])
                    n1x, n1y, n1z = (unr[kn + 3], unr[kn + 4],
                                     unr[kn + 5])
                    n2x, n2y, n2z = (unr[kn + 6], unr[kn + 7],
                                     unr[kn + 8])
                    nox = dw0 * n0x + du * n1x + dv * n2x
                    noy = dw0 * n0y + du * n1y + dv * n2y
                    noz = dw0 * n0z + du * n1z + dv * n2z
                    nwx = m[0] * nox + m[4] * noy + m[8] * noz
                    nwy = m[1] * nox + m[5] * noy + m[9] * noz
                    nwz = m[2] * nox + m[6] * noy + m[10] * noz
                    slot_k = jnp.maximum(ptag, 0) >> 24
                    midx = (jnp.clip(cur_li, 0, CHUNK - 1) * n_slots
                            + jnp.clip(slot_k, 0, n_slots - 1))
                    mat_k = cs[midx]
                    if alpha_test:
                        # the cutout needs REAL uv: one divide per candidate
                        inv_a = 1.0 / jnp.where(ok, adet, 1.0)
                        ruvx = uvx * inv_a
                        ruvy = uvy * inv_a
                        is_leaf_m = (
                            smodel_ref[jnp.clip(mat_k, 0, n_mats - 1)]
                            == _SHADE_LEAF)
                        curve = (1.0 - (1.0 - 2.0 * ruvx) ** 2) * 0.2
                        leaf_ok = jnp.abs(ruvy - 0.5) < curve
                        # force-opaque instances skip the any-hit test
                        forced = (cur_raw & INST_OPAQUE_BIT) != 0
                        hit = hit & (jnp.logical_not(is_leaf_m) | leaf_ok
                                     | forced)
                    best_prim = jnp.where(hit, ptag & 0x00FFFFFF, best_prim)
                    best_inst = jnp.where(hit, cur_inst, best_inst)
                    best_uvx = jnp.where(hit, uvx, best_uvx)
                    best_uvy = jnp.where(hit, uvy, best_uvy)
                    best_nx = jnp.where(hit, nwx, best_nx)
                    best_ny = jnp.where(hit, nwy, best_ny)
                    best_nz = jnp.where(hit, nwz, best_nz)
                    best_mat = jnp.where(hit, mat_k, best_mat)
                    num_b = jnp.where(hit, dt, num_b)
                    den_b = jnp.where(hit, adet, den_b)
                best_ref[0] = num_b
                best_ref[9] = den_b
                best_ref[1] = pltpu.bitcast(best_prim, jnp.float32)
                best_ref[2] = pltpu.bitcast(best_inst, jnp.float32)
                best_ref[3] = best_uvx
                best_ref[4] = best_uvy
                best_ref[5] = best_nx
                best_ref[6] = best_ny
                best_ref[7] = best_nz
                best_ref[8] = pltpu.bitcast(best_mat, jnp.float32)
                # ONE divide per leaf step refreshes the box-test prune plane
                best_ref[10] = num_b / den_b

            if wide:
                sp = _wide_pushes_paged(
                    stack_ref, flag_ref, sp, is_box, is_inst, is_chunk, c0,
                    S, inst_ok,
                    jnp.int32(_LOCAL_ROOT) | (code & jnp.int32(OBJ_FLAG)))
            else:
                box_i = is_box.astype(jnp.int32)
                any0 = flag_ref[0] * box_i
                any1 = flag_ref[1] * box_i
                first0 = flag_ref[2]
                near_c = jnp.where(first0 == 1, c0, c1)
                far_c = jnp.where(first0 == 1, c1, c0)
                near_ok = jnp.where(first0 == 1, any0, any1)
                far_ok = jnp.where(first0 == 1, any1, any0)
                p1 = jnp.where(is_chunk, 1,
                               jnp.where(is_inst, inst_ok, far_ok))
                chunk_root = jnp.int32(_LOCAL_ROOT) | (
                    code & jnp.int32(OBJ_FLAG))
                p1_val = jnp.where(is_chunk, chunk_root,
                                   jnp.where(is_inst, c0, far_c))
                stack_ref[
                    jnp.where(p1 == 1, jnp.minimum(sp, S - 1), S)] = p1_val
                sp = sp + p1
                stack_ref[
                    jnp.where(near_ok == 1, jnp.minimum(sp, S - 1), S)
                ] = near_c
                sp = sp + near_ok
            return step + 1, sp

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(1)))

        # ratio state: divide ONCE per ray (t, uv, unnormalized normal)
        inv_den = 1.0 / best_ref[9]
        best_t = best_ref[0] * inv_den
        best_prim = pltpu.bitcast(best_ref[1], jnp.int32)
        best_inst = pltpu.bitcast(best_ref[2], jnp.int32)
        miss = best_prim < 0
        stv(t_out, 0, jnp.where(miss, jnp.float32(jnp.inf), best_t))
        stv(prim_out, 0, best_prim)
        stv(inst_out, 0, jnp.where(miss, -1, best_inst))
        stv(uvx_out, 0, best_ref[3] * inv_den)
        stv(uvy_out, 0, best_ref[4] * inv_den)
        stv(nx_out, 0, best_ref[5] * inv_den)
        stv(ny_out, 0, best_ref[6] * inv_den)
        stv(nz_out, 0, best_ref[7] * inv_den)
        stv(mat_out, 0,
            jnp.where(miss, 0, pltpu.bitcast(best_ref[8], jnp.int32)))

    return kernel


@partial(
    jax.jit,
    static_argnames=("root_code", "stack_size", "max_steps", "n_slots",
                     "image_shape", "wide", "cull_mask", "pack"),
)
def trace_resolve_scene_pallas_paged(
    scene: PagedScene,
    ray_o: jax.Array,
    ray_d: jax.Array,
    t_max: jax.Array,
    *,
    root_code: int,
    stack_size: int,
    max_steps: int,
    n_slots: int = 1,
    active: Optional[jax.Array] = None,
    shading_model: Optional[jax.Array] = None,
    image_shape=None,
    wide: bool = False,
    cull_mask: int = 0xFF,
    pack: int = 1,
):
    """Paged fused closest-hit + attribute resolve (mirror of
    trace_resolve_scene_pallas). ``n_slots`` must match the slot_materials
    width the scene was assembled with (chunk smat block layout)."""
    from .trace_kernel import _pack_rays, image_mode_ok

    r = ray_o.shape[0]
    t_cap = jnp.asarray(t_max, jnp.float32) + ray_o[:, 0] * 0.0
    if active is not None:
        t_cap = jnp.where(active, t_cap, -3e38)  # see trace_kernel: origin-inside boxes

    image_mode = image_mode_ok(image_shape, r)
    pack = max(1, min(pack, r // PACKET))
    (ray_args, ray_spec, out_spec, g, out_shape, unflatten, _sub,
     pack) = _pack_rays(ray_o, ray_d, t_cap, image_shape, sub_cap=1,
                        pack=pack)

    sb, sc, lpos, lprim = _split_static(scene)
    luv = scene.leaf_rows[:, _UV:].reshape(-1)
    lnrm = scene.leaf_nrm.reshape(-1)
    ns = sb.shape[0] // 12
    pad12 = _pad1024(sb.shape[0])
    pad2 = _pad1024(sc.shape[0])
    sb = jnp.pad(sb, (0, pad12 - sb.shape[0]))
    sc = jnp.pad(sc, (0, pad2 - sc.shape[0]))
    nbc = scene.bch_codes.shape[0] // BCH_CODE
    if nbc:
        # big-model BLAS chunks: leaves page too — unified leaf scratch
        lpad_pos = _pad1024(lpos.shape[0])
        lpad_prim = _pad1024(lprim.shape[0])
        lpad_uv = _pad1024(luv.shape[0])
        lpad_nrm = _pad1024(lnrm.shape[0])
        lpos = jnp.pad(lpos, (0, lpad_pos - lpos.shape[0]))
        lprim = jnp.pad(lprim, (0, lpad_prim - lprim.shape[0]))
        luv = jnp.pad(luv, (0, lpad_uv - luv.shape[0]))
        lnrm = jnp.pad(lnrm, (0, lpad_nrm - lnrm.shape[0]))
    else:
        lpad_pos = lpad_prim = lpad_uv = lpad_nrm = 0
    # wide steps push up to 3 net entries per pop over half the depth
    eff_stack = (stack_size * 3) // 2 + 2 if wide else stack_size
    assert eff_stack <= _STACK, "scene too deep for the packet kernel"

    alpha_test = shading_model is not None
    n_mats = shading_model.shape[0] if alpha_test else 1
    kernel = _make_resolve_kernel_paged(
        root_code, max_steps, n_slots, ns, pad12, pad2,
        nbc, lpad_pos, lpad_prim, lpad_uv, lpad_nrm,
        alpha_test=alpha_test, n_mats=n_mats,
        image_mode=image_mode, wide=wide, cull_mask=cull_mask, pack=pack)

    smem = lambda n: pl.BlockSpec(
        (n,), lambda i: (0,), memory_space=pltpu.SMEM)
    anyspace = pl.BlockSpec(memory_space=pl.ANY)

    f32 = jnp.float32
    model_specs = [smem(n_mats)] if alpha_test else []
    model_args = (
        [shading_model.astype(jnp.int32).reshape(-1)] if alpha_test else [])
    leaf_specs = ([anyspace] * 4 if nbc else
                  [smem(lpos.shape[0]), smem(lprim.shape[0]),
                   smem(luv.shape[0]), smem(lnrm.shape[0])])
    bch_specs = [anyspace] * 6 if nbc else []
    bch_args = ([scene.bch_nodes, scene.bch_codes, scene.bch_lpos,
                 scene.bch_lprim, scene.bch_luv, scene.bch_lnrm]
                if nbc else [])
    leaf_scratch = ([
        pltpu.SMEM((lpad_pos + BCH_POS,), jnp.float32),
        pltpu.SMEM((lpad_prim + BCH_PRIM,), jnp.int32),
        pltpu.SMEM((lpad_uv + BCH_UV,), jnp.float32),
        pltpu.SMEM((lpad_nrm + BCH_NRM,), jnp.float32),
    ] if nbc else [])
    out_dts = [f32, jnp.int32, jnp.int32, f32, f32, f32, f32, f32, jnp.int32]
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            anyspace, anyspace,
            leaf_specs[0], leaf_specs[1], leaf_specs[2], leaf_specs[3],
            anyspace, anyspace, anyspace,
        ] + bch_specs + model_specs + [ray_spec] * 7,
        out_specs=[out_spec] * 9,
        out_shape=[out_shape(dt) for dt in out_dts],
        scratch_shapes=[
            pltpu.VMEM((9, 8 * pack, 128), jnp.float32),   # object-space ray
            pltpu.VMEM((11, 8 * pack, 128), jnp.float32),  # best (+den+prune)
            pltpu.SMEM((12 if wide else 8,), jnp.int32),  # cross-branch
            pltpu.SMEM((12,), jnp.float32),         # current instance inverse
            pltpu.SMEM((pad12 + _BF + (BCH_NODE if nbc else 0),),
                       jnp.float32),                # unified nodes + chunks
            pltpu.SMEM((pad2 + _CI + (BCH_CODE if nbc else 0),),
                       jnp.int32),                  # unified codes + chunks
            pltpu.SMEM((smat_block(n_slots),), jnp.int32),  # chunk smat
        ] + leaf_scratch + [
            pltpu.SemaphoreType.DMA((15 if nbc else 5,)),
            pltpu.SMEM((_STACK + 1,), jnp.int32),   # scalar stack + trash slot
        ],
        interpret=INTERPRET,
    )(sb, sc, lpos, lprim, luv, lnrm,
      scene.chunk_boxes, scene.chunk_codes, scene.chunk_smat,
      *bch_args, *model_args, *ray_args)

    flat = [unflatten(x) for x in outs]
    t_f, prim_f, inst_f, uvx, uvy, nx, ny, nz, mat = flat
    return {
        "t": t_f, "prim": prim_f, "inst": inst_f,
        "uv": jnp.stack([uvx, uvy], axis=-1),
        "normal": jnp.stack([nx, ny, nz], axis=-1),
        "material": mat,
    }


@partial(
    jax.jit,
    static_argnames=("root_code", "stack_size", "any_hit", "max_steps",
                     "image_shape", "wide", "debug_steps", "cull_mask",
                     "pack"),
)
def trace_scene_pallas_paged(
    scene: PagedScene,
    ray_o: jax.Array,
    ray_d: jax.Array,
    t_max: jax.Array,
    *,
    root_code: int,
    stack_size: int,
    max_steps: int,
    any_hit: bool = False,
    active: Optional[jax.Array] = None,
    image_shape=None,
    wide: bool = False,
    debug_steps: bool = False,
    cull_mask: int = 0xFF,
    pack: int = 1,
) -> HitRecord2:
    """Paged packet traversal front end (mirror of trace_scene_pallas)."""
    from .trace_kernel import _pack_rays, image_mode_ok

    r = ray_o.shape[0]
    t_cap = jnp.asarray(t_max, jnp.float32) + ray_o[:, 0] * 0.0
    if active is not None:
        t_cap = jnp.where(active, t_cap, -3e38)  # see trace_kernel: origin-inside boxes

    image_mode = image_mode_ok(image_shape, r)
    pack = max(1, min(pack, r // PACKET))
    (ray_args, ray_spec, out_spec, g, out_shape, unflatten, _sub,
     pack) = _pack_rays(ray_o, ray_d, t_cap, image_shape, sub_cap=1,
                        pack=pack)

    sb, sc, lpos, lprim = _split_static(scene)
    ns = sb.shape[0] // 12
    pad12 = _pad1024(sb.shape[0])
    pad2 = _pad1024(sc.shape[0])
    sb = jnp.pad(sb, (0, pad12 - sb.shape[0]))
    sc = jnp.pad(sc, (0, pad2 - sc.shape[0]))
    nbc = scene.bch_codes.shape[0] // BCH_CODE
    if nbc:
        # big-model BLAS chunks: leaves page too — unified leaf scratch
        lpad_pos = _pad1024(lpos.shape[0])
        lpad_prim = _pad1024(lprim.shape[0])
        lpos = jnp.pad(lpos, (0, lpad_pos - lpos.shape[0]))
        lprim = jnp.pad(lprim, (0, lpad_prim - lprim.shape[0]))
    else:
        lpad_pos = lpad_prim = 0
    # wide steps push up to 3 net entries per pop over half the depth
    eff_stack = (stack_size * 3) // 2 + 2 if wide else stack_size
    assert eff_stack <= _STACK, "scene too deep for the packet kernel"

    kernel = _make_kernel_paged(root_code, max_steps, any_hit,
                                ns, pad12, pad2,
                                nbc, lpad_pos, lpad_prim,
                                image_mode=image_mode, wide=wide,
                                debug_steps=debug_steps,
                                cull_mask=cull_mask, pack=pack)

    smem = lambda n: pl.BlockSpec(
        (n,), lambda i: (0,), memory_space=pltpu.SMEM)
    anyspace = pl.BlockSpec(memory_space=pl.ANY)

    leaf_specs = ([anyspace] * 2 if nbc else
                  [smem(lpos.shape[0]), smem(lprim.shape[0])])
    bch_specs = [anyspace] * 4 if nbc else []
    bch_args = ([scene.bch_nodes, scene.bch_codes, scene.bch_lpos,
                 scene.bch_lprim] if nbc else [])
    leaf_scratch = ([
        pltpu.SMEM((lpad_pos + BCH_POS,), jnp.float32),
        pltpu.SMEM((lpad_prim + BCH_PRIM,), jnp.int32),
    ] if nbc else [])
    f32 = jnp.float32
    out_dts = [f32, jnp.int32, jnp.int32, f32, f32]
    t_r, prim_r, inst_r, u_r, v_r = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            anyspace, anyspace,
            leaf_specs[0], leaf_specs[1],
            anyspace, anyspace,
        ] + bch_specs + [ray_spec] * 7,
        out_specs=[out_spec] * 5,
        out_shape=[out_shape(dt) for dt in out_dts],
        scratch_shapes=[
            pltpu.VMEM((9, 8 * pack, 128), jnp.float32),   # object-space ray
            pltpu.VMEM((7, 8 * pack, 128), jnp.float32),   # best + prune + den
            pltpu.SMEM((12 if wide else 8,), jnp.int32),  # cross-branch
            pltpu.SMEM((pad12 + _BF + (BCH_NODE if nbc else 0),),
                       jnp.float32),                # unified nodes + chunks
            pltpu.SMEM((pad2 + _CI + (BCH_CODE if nbc else 0),),
                       jnp.int32),                  # unified codes + chunks
        ] + leaf_scratch + [
            pltpu.SemaphoreType.DMA((10 if nbc else 4,)),
            pltpu.SMEM((_STACK + 1,), jnp.int32),   # scalar stack + trash slot
        ],
        interpret=INTERPRET,
    )(sb, sc, lpos, lprim, scene.chunk_boxes, scene.chunk_codes,
      *bch_args, *ray_args)

    return HitRecord2(
        t=unflatten(t_r), prim=unflatten(prim_r), inst=unflatten(inst_r),
        bary=jnp.stack([unflatten(u_r), unflatten(v_r)], axis=-1),
    )
