"""Pallas packet-traversal kernel for the two-level BVH.

Replaces ``vkCmdTraceRaysKHR``'s hardware traversal
(reference src/PaperRenderer/RayTrace.cpp:34-95) with a TPU-native design:

  * **Ray packets**: 1024 rays = one (8, 128) vector tile per SoA plane.
    All per-ray math (slab tests, Möller-Trumbore) is full-width VPU work.
  * **Shared scalar stack**: the packet traverses ONE node sequence — pop/
    push are pure scalar loads/stores on an SMEM scratch array (plus a trash
    slot absorbing non-pushes), and each step takes a REAL scalar branch
    (box / leaf / instance), so there is no lockstep union cost per step
    like the XLA path pays, and no vector->scalar transfer on the pop path.
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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .accel import (
    _PAYLOAD_MASK, _POS, _TYPE_SHIFT, _UV, INST_ID_MASK, INST_OPAQUE_BIT, K,
    HitRecord2, RTScene, TYPE_BOX, TYPE_INST, TYPE_LEAF,
)

PACKET = 1024            # rays per packet: one (8, 128) tile per plane
# packets per GRID STEP (flat mode): grouping SUB packets per step amortizes
# per-grid-step block plumbing; the traversal still runs one 1024-ray packet
# at a time (same footprint, same vector width). MEASURED NEUTRAL on TPU
# (composed RT frame 87.7/87.8/86.8 ms at sub=1/4/8; raw block plumbing is
# ~0.03 ms/wave — an identity kernel over the same blocks — so there was
# nothing to amortize; the ~1.3 us/packet dead floor is kernel init + the
# root step + while-loop scalar overhead, which grouping cannot remove).
# Kept as a sweepable knob; read at call time (_pack_rays sub_cap=0).
SUBPACKETS = 1
# test hook: run the packet kernels in the Pallas interpreter (CPU tests
# monkeypatch this — mirrors raster_exact.INTERPRET)
INTERPRET = False
_SMEM_BUDGET = 700 * 1024  # bytes of SMEM we allow the scene to occupy
_STACK = 128             # kernel stack entries (SMEM scalar array + trash slot)
_SHADE_LEAF = 1          # == core.material.SHADE_LEAF (kernel constant)


def traversal_step_bound(scene: RTScene, n_instances: int) -> int:
    """Safe while-loop bound for the packet traversal.

    The naive ``nodes + leaves`` bound undercounts: a BLAS shared by M
    instances is re-traversed up to M times per packet (every instance leaf
    pop pushes its BLAS root). Each pop of a BLAS with L leaves costs at most
    2L-1 steps, so total steps <= TLAS pops (2N) + N * 2 * (total leaf rows)
    — a loose but sound ceiling. The loop exits on an empty stack long
    before this in practice; the bound only guards against corrupted codes."""
    nn = scene.nodes.shape[0]
    nl = scene.leaf_rows.shape[0]
    return min(2**31 - 2, 2 * n_instances * (nl + 2) + nn + 64)


def pallas_traversal_ok(scene: RTScene, n_rays: int) -> bool:
    nn = scene.nodes.shape[0]
    nl = scene.leaf_rows.shape[0]
    bytes_needed = nn * 12 * 4 + nn * 2 * 4 + nl * 72 * 4 + nl * K * 4
    return (
        jax.default_backend() == "tpu"
        and bytes_needed <= _SMEM_BUDGET
        and n_rays >= PACKET
    )


def pallas_resolve_ok(scene: RTScene, n_rays: int,
                      slot_materials: jax.Array) -> bool:
    """The fused trace+resolve kernel additionally keeps leaf uvs/normals and
    the slot-material table in SMEM."""
    nn = scene.nodes.shape[0]
    nl = scene.leaf_rows.shape[0]
    extra = nl * (48 + 72) * 4 + slot_materials.size * 4
    bytes_needed = (nn * 12 * 4 + nn * 2 * 4 + nl * 72 * 4 + nl * K * 4
                    + extra)
    return (
        jax.default_backend() == "tpu"
        and bytes_needed <= _SMEM_BUDGET
        and n_rays >= PACKET
    )


def _split_scene(scene: RTScene):
    """Unified node table -> SMEM-friendly flat arrays (the RTScene already
    keeps codes/prim ids in separate i32 arrays — no bitcasts needed).

    boxes  f32[Nn*12]  box floats (box rows) / inverse TRS (instance rows)
    codes  i32[Nn*2]   child codes (box rows) / [root code, self id] (inst)
    lpos   f32[Nl*72]  K object-space triangles
    lprim  i32[Nl*K]   tagged prim ids ((slot<<24)|tri, -1 = dead)
    """
    boxes = scene.nodes
    codes = scene.codes
    lpos = scene.leaf_rows[:, _POS:_UV]
    lprim = scene.leaf_prim
    return boxes.reshape(-1), codes.reshape(-1), lpos.reshape(-1), lprim.reshape(-1)


def _io_helpers(image_mode: bool):
    """Block load/store for the two packet groupings.

    flat mode: per-component (g*SUB, 8, 128) arrays, block (SUB, 8, 128) —
    packets are 1024 consecutive rays (pixel tiles for tile-order
    wavefronts); each grid step processes SUB packets sequentially
    (``sub`` selects the packet within the block) to amortize the
    per-grid-step block plumbing.
    image mode: per-component [H, W] arrays, block (8, 128) with a
    tile-walking index_map — packets are (8, 128) PIXEL TILES with ZERO
    relayout, because T(8,128) physical tiling stores exactly these blocks
    contiguously (this sidesteps the transpose-input trap below: the tile
    permutation happens in the index_map, never in XLA)."""
    if image_mode:
        ld = lambda ref, sub: ref[...]

        def st(ref, sub, v):
            ref[...] = v
    else:
        ld = lambda ref, sub: ref[sub]

        def st(ref, sub, v):
            ref[sub] = v
    return ld, st


def _wide_box_step(boxes_ref, codes_ref, flag_ref, payload, c0, c1,
                   px, py, pz, ix, iy, iz, best_t):
    """Grandchild (BVH4) box step over the unchanged binary node table.

    A box row already stores BOTH children's boxes, so a 4-wide step needs
    no 4-wide build: pop row p, and for each box-typed child read ITS row
    (the grandchildren's boxes + codes); a non-box child (leaf/instance)
    contributes itself with the box stored in row p. Up to 4 slab tests per
    pop — the same total box tests as two binary steps over a full subtree
    (slightly more where a binary step would have culled a child) — but
    HALF the while-loop iterations, so the per-step fixed cost (branch
    dispatch, pop latency, code decode) is paid half as often. Rows at odd
    depths are read but never popped; tree parity needs no special-casing.

    Reports up to 4 pushes through ``flag_ref``: [0..3] = push flags in
    far-to-near order, [4..7] = the codes (a 5-comparator sorting network
    orders the 4 entry keys; misses carry +3e38 and sink to the end)."""
    inf = jnp.float32(3e38)

    def slab(bb):
        lx, ly, lz = boxes_ref[bb], boxes_ref[bb + 1], boxes_ref[bb + 2]
        hx, hy, hz = boxes_ref[bb + 3], boxes_ref[bb + 4], boxes_ref[bb + 5]
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
        # reject dead children (min > max)
        hit = (tf >= jnp.maximum(tn, 0.0)) & (tn <= best_t) & (lx <= hx)
        return jnp.min(jnp.where(hit, tn, inf))

    keys = []
    codes = []
    for side, cs in ((0, c0), (1, c1)):
        is_b = ((cs >> _TYPE_SHIFT) & 3) == TYPE_BOX
        gp = jnp.where(is_b, cs & _PAYLOAD_MASK, 0)
        # box child -> its two grandchildren; other -> the child itself
        # (box from row p, pushed code = the child code)
        keys.append(slab(jnp.where(is_b, gp * 12, payload * 12 + side * 6)))
        codes.append(jnp.where(is_b, codes_ref[gp * 2], cs))
        k1 = slab(gp * 12 + 6)
        keys.append(jnp.where(is_b, k1, inf))
        codes.append(codes_ref[gp * 2 + 1])

    for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        a, b = keys[i], keys[j]
        ca, cb = codes[i], codes[j]
        sw = a > b
        keys[i] = jnp.where(sw, b, a)
        keys[j] = jnp.where(sw, a, b)
        codes[i] = jnp.where(sw, cb, ca)
        codes[j] = jnp.where(sw, ca, cb)

    # push order: farthest (largest finite key) first
    for k in range(4):
        e = 3 - k
        flag_ref[k] = (keys[e] < inf).astype(jnp.int32)
        flag_ref[4 + k] = codes[e]


def _wide_pushes(stack_ref, flag_ref, sp, is_box, is_inst, c0, S,
                 inst_ok=None):
    """The 4 conditional pushes reported by ``_wide_box_step`` (instance
    pops push their BLAS root as the single first entry; ``inst_ok`` gates
    that push on the instance's 8-bit visibility mask)."""
    box_i = is_box.astype(jnp.int32)
    for k in range(4):
        pf = flag_ref[k] * box_i
        pv = flag_ref[4 + k]
        if k == 0:
            ok = jnp.int32(1) if inst_ok is None else inst_ok
            pf = jnp.where(is_inst, ok, pf)
            pv = jnp.where(is_inst, c0, pv)
        stack_ref[jnp.where(pf == 1, jnp.minimum(sp, S - 1), S)] = pv
        sp = sp + pf
    return sp


def _make_kernel(root_code: int, max_steps: int, any_hit: bool,
                 debug_steps: bool = False, image_mode: bool = False,
                 wide: bool = False, cull_mask: int = 0xFF,
                 sub_n: int = 1, pack: int = 1):
    """Packet kernel. Vector state (best hit planes, object-space ray) lives
    in VMEM scratch refs mutated under ``pl.when`` — real branches with no
    state yields, so a step costs only its own branch's work. The while carry
    holds just scalars; the shared stack is an SMEM scratch array (scalar
    loads/stores at dynamic indices), and cross-branch scalars (slab
    outcomes, any-hit progress) round-trip through an SMEM scratch.
    ``wide=True`` replaces the binary box step with the 4-wide grandchild
    step (``_wide_box_step``)."""
    S = _STACK
    ld, st = _io_helpers(image_mode)
    V = (8 * pack, 128)      # packet vector shape (pack sub-blocks, one stack)
    FI = 8 if wide else 3    # flag slot: current instance id
    FH = 9 if wide else 4    # flag slot: all-rays-hit (any-hit early exit)

    def kernel(boxes_ref, codes_ref, lpos_ref, lprim_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               t_out, prim_out, inst_out, u_out, v_out,
               obj_ref, best_ref, flag_ref, stack_ref):
        def run(sub, carry):
            wox, woy, woz = ld(ox_ref, sub), ld(oy_ref, sub), ld(oz_ref, sub)
            wdx, wdy, wdz = ld(dx_ref, sub), ld(dy_ref, sub), ld(dz_ref, sub)

            def safe_inv(x):
                return 1.0 / jnp.where(jnp.abs(x) < 1e-12, 1e-12, x)

            wix, wiy, wiz = safe_inv(wdx), safe_inv(wdy), safe_inv(wdz)

            # best planes: [0]=t NUMERATOR [1]=prim(bits) [2]=inst(bits)
            # [3]=u num [4]=v num [6]=shared DENOMINATOR (|det| of the winner;
            # 1.0 = "no fragment", so num/den = the plain t). Ratio state lets
            # the Möller-Trumbore loop compare depths by cross-multiplication
            # (dt*den_b < num_b*adet, all operands >= 0) — the per-candidate
            # divide drops out; u/v/t divide ONCE per packet at the end.
            # [5]=prune bound for box tests (an actual t, one divide per leaf
            # step): closest mode tracks best t; any-hit mode drops to -3e38
            # once a ray commits, removing it from every later slab-test union.
            neg1 = pltpu.bitcast(jnp.full(V, -1, jnp.int32), jnp.float32)
            best_ref[0] = ld(tmax_ref, sub)
            best_ref[1] = neg1
            best_ref[2] = neg1
            best_ref[3] = jnp.zeros(V, jnp.float32)
            best_ref[4] = jnp.zeros(V, jnp.float32)
            best_ref[5] = ld(tmax_ref, sub)
            best_ref[6] = jnp.ones(V, jnp.float32)
            # object-space ray planes: o(3) d(3) inv(3)
            for i, v in enumerate((wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz)):
                obj_ref[i] = v
            flag_ref[FI] = jnp.int32(0)   # cur_inst
            flag_ref[FH] = jnp.int32(0)   # all-hit (any_hit early exit)

            # SMEM scalar stack: push/pop are pure scalar-domain loads/stores —
            # no per-step (1, S) vector selects and no vector->scalar reduction
            # on the sequential critical path. Slot S is a trash slot absorbing
            # non-pushes (unconditional stores, no predicated lowering).
            stack_ref[0] = jnp.int32(root_code)

            def cond(st):
                step, sp, done = st
                return (sp > 0) & (step < max_steps) & (done == 0)

            def body(st):
                step, sp, done = st
                sp = sp - 1
                code = stack_ref[sp]
                typ = (code >> _TYPE_SHIFT) & 3
                payload = code & _PAYLOAD_MASK
                obj = ((code >> 30) & 1) == 1
                is_box = typ == TYPE_BOX
                is_leaf = typ == TYPE_LEAF
                is_inst = typ == TYPE_INST
                c0 = codes_ref[payload * 2]
                c1 = codes_ref[payload * 2 + 1]
                # instance record word c1 = [mask:8 | opaque:1 | id:23]; the
                # BLAS-root push is gated on mask & cull_mask (RayTrace.h:19-35)
                inst_ok = (((c1 >> 24) & cull_mask) != 0).astype(jnp.int32)

                @pl.when(is_box)
                def _box():
                    b = payload * 12
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
                        _wide_box_step(boxes_ref, codes_ref, flag_ref, payload,
                                       c0, c1, px, py, pz, ix, iy, iz, best_t)
                        return

                    def slab(o6):
                        lx, ly, lz = boxes_ref[b + o6], boxes_ref[b + o6 + 1], boxes_ref[b + o6 + 2]
                        hx, hy, hz = boxes_ref[b + o6 + 3], boxes_ref[b + o6 + 4], boxes_ref[b + o6 + 5]
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
                        # reject dead children (marked min > max; the min/max
                        # normalization above would otherwise always-hit them)
                        hit = (tf >= jnp.maximum(tn, 0.0)) & (tn <= best_t) & (lx <= hx)
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
                    b = payload * 12
                    m = [boxes_ref[b + k] for k in range(12)]
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
                    flag_ref[FI] = c1    # instance slot id

                @pl.when(is_leaf)
                def _leaf():
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
                        ax, ay, az = lpos_ref[tb], lpos_ref[tb + 1], lpos_ref[tb + 2]
                        e1x, e1y, e1z = (lpos_ref[tb + 3], lpos_ref[tb + 4],
                                         lpos_ref[tb + 5])
                        e2x, e2y, e2z = (lpos_ref[tb + 6], lpos_ref[tb + 7],
                                         lpos_ref[tb + 8])
                        ptag = lprim_ref[pb + k]
                        px_ = ody * e2z - odz * e2y
                        py_ = odz * e2x - odx * e2z
                        pz_ = odx * e2y - ody * e2x
                        det = e1x * px_ + e1y * py_ + e1z * pz_
                        # division-free: fold the triangle's orientation into the
                        # numerators (du = u*det*s etc., s = sign(det)) and test
                        # against |det|; depth compares cross-multiply with the
                        # carried (num, den) winner — no divide in the loop.
                        # Range: dets are OBJECT-space (instance scale s only
                        # enters via the 1/s-scaled object ray), so the products
                        # stay ~ t*det_a*det_b — ~1e15 even at s=1e-6 — and the
                        # 1e-12 adet floor bounds the small side at ~1e-27;
                        # overflow/denormal-flush needs |combined scale| ~ 1e-17
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

                # functional pushes from the branch-reported scalars
                if wide:
                    sp = _wide_pushes(stack_ref, flag_ref, sp, is_box, is_inst,
                                      c0, S, inst_ok)
                else:
                    box_i = is_box.astype(jnp.int32)
                    any0 = flag_ref[0] * box_i
                    any1 = flag_ref[1] * box_i
                    first0 = flag_ref[2]
                    near_c = jnp.where(first0 == 1, c0, c1)
                    far_c = jnp.where(first0 == 1, c1, c0)
                    near_ok = jnp.where(first0 == 1, any0, any1)
                    far_ok = jnp.where(first0 == 1, any1, any0)
                    # instance pop pushes its BLAS root (c0) if mask-visible;
                    # box: far then near
                    p1 = jnp.where(is_inst, inst_ok, far_ok)
                    p1_val = jnp.where(is_inst, c0, far_c)
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
            st(t_out, sub, jnp.where(miss, jnp.float32(jnp.inf), best_t))
            st(prim_out, sub, best_prim)
            st(inst_out, sub, jnp.where(miss, -1, best_inst))
            if debug_steps:
                st(u_out, sub,
                   jnp.full(V, fin[0], jnp.int32).astype(jnp.float32))
            else:
                st(u_out, sub, best_ref[3] * inv_den)
            st(v_out, sub, best_ref[4] * inv_den)
            return carry

        if sub_n == 1:
            run(0, 0)
        else:
            jax.lax.fori_loop(0, sub_n, run, 0)


    return kernel


def _make_resolve_kernel(root_code: int, max_steps: int, n_slots: int,
                         n_inst: int, alpha_test: bool = False,
                         n_mats: int = 1, image_mode: bool = False,
                         wide: bool = False, cull_mask: int = 0xFF,
                         sub_n: int = 1, pack: int = 1):
    """Fused trace+resolve packet kernel.

    Identical traversal to _make_kernel, but hit attributes are interpolated
    AT HIT TIME from SMEM-resident leaf uvs/normals (all packet rays process
    the same leaf simultaneously, so the vertex attributes are scalar
    broadcasts), the normal is transformed to world space by the transpose of
    the current instance's inverse (already in SMEM from the instance
    switch), and the material id is a scalar slot_materials load. This
    removes the per-ray attribute row gathers that dominated the XLA resolve
    (~30 ns/row x 2 rows x rays — 135 ms of a 1080p frame).

    ``alpha_test`` adds the leaf-cutout any-hit gate (reference leaf.rahit):
    hits on SHADE_LEAF materials are rejected where the procedural leaf
    alpha at the hit uv is below 0.5 — evaluated in-kernel from the uv the
    resolve path already interpolates."""
    S = _STACK
    V = (8 * pack, 128)      # packet vector shape (pack sub-blocks, one stack)
    ld, st = _io_helpers(image_mode)
    FI = 8 if wide else 3    # flag slot: current instance id

    def kernel(boxes_ref, codes_ref, lpos_ref, lprim_ref,
               luv_ref, lnrm_ref, smat_ref, *rest):
        if alpha_test:
            smodel_ref = rest[0]
            rest = rest[1:]
        (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
         t_out, prim_out, inst_out, uvx_out, uvy_out,
         nx_out, ny_out, nz_out, mat_out,
         obj_ref, best_ref, flag_ref, minv_ref, stack_ref) = rest
        def run(sub, carry):
            wox, woy, woz = ld(ox_ref, sub), ld(oy_ref, sub), ld(oz_ref, sub)
            wdx, wdy, wdz = ld(dx_ref, sub), ld(dy_ref, sub), ld(dz_ref, sub)

            def safe_inv(x):
                return 1.0 / jnp.where(jnp.abs(x) < 1e-12, 1e-12, x)

            wix, wiy, wiz = safe_inv(wdx), safe_inv(wdy), safe_inv(wdz)

            neg1 = pltpu.bitcast(jnp.full(V, -1, jnp.int32), jnp.float32)
            # ratio winner state (see _make_kernel): [0]=t num, [3..7]=uv/normal
            # NUMERATORS, [9]=|det| den (1.0 = none), [10]=prune t plane for the
            # box tests (one divide per leaf step, not per candidate)
            best_ref[0] = ld(tmax_ref, sub)
            best_ref[1] = neg1
            best_ref[2] = neg1
            for i in range(3, 8):
                best_ref[i] = jnp.zeros(V, jnp.float32)
            best_ref[8] = pltpu.bitcast(jnp.zeros(V, jnp.int32), jnp.float32)
            best_ref[9] = jnp.ones(V, jnp.float32)
            best_ref[10] = ld(tmax_ref, sub)
            for i, v in enumerate((wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz)):
                obj_ref[i] = v
            flag_ref[FI] = jnp.int32(0)   # cur_inst
            # identity inverse until the first instance switch
            for i in range(12):
                minv_ref[i] = jnp.float32(1.0 if i in (0, 5, 10) else 0.0)

            # SMEM scalar stack (see _make_kernel): slot S = trash slot
            stack_ref[0] = jnp.int32(root_code)

            def cond(st):
                step, sp = st
                return (sp > 0) & (step < max_steps)

            def body(st):
                step, sp = st
                sp = sp - 1
                code = stack_ref[sp]
                typ = (code >> _TYPE_SHIFT) & 3
                payload = code & _PAYLOAD_MASK
                obj = ((code >> 30) & 1) == 1
                is_box = typ == TYPE_BOX
                is_leaf = typ == TYPE_LEAF
                is_inst = typ == TYPE_INST
                c0 = codes_ref[payload * 2]
                c1 = codes_ref[payload * 2 + 1]
                # instance record word c1 = [mask:8 | opaque:1 | id:23]
                inst_ok = (((c1 >> 24) & cull_mask) != 0).astype(jnp.int32)

                @pl.when(is_box)
                def _box():
                    b = payload * 12
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
                        _wide_box_step(boxes_ref, codes_ref, flag_ref, payload,
                                       c0, c1, px, py, pz, ix, iy, iz, best_t)
                        return

                    def slab(o6):
                        lx, ly, lz = boxes_ref[b + o6], boxes_ref[b + o6 + 1], boxes_ref[b + o6 + 2]
                        hx, hy, hz = boxes_ref[b + o6 + 3], boxes_ref[b + o6 + 4], boxes_ref[b + o6 + 5]
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
                    b = payload * 12
                    m = [boxes_ref[b + k] for k in range(12)]
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
                    flag_ref[FI] = c1    # instance slot id
                    for k in range(12):
                        minv_ref[k] = m[k]

                @pl.when(is_leaf)
                def _leaf():
                    b = payload * 72
                    ub = payload * 48
                    nb = payload * 72
                    pb = payload * K
                    oox, ooy, ooz = obj_ref[0], obj_ref[1], obj_ref[2]
                    odx, ody, odz = obj_ref[3], obj_ref[4], obj_ref[5]
                    num_b = best_ref[0]
                    den_b = best_ref[9]
                    best_prim = pltpu.bitcast(best_ref[1], jnp.int32)
                    best_inst = pltpu.bitcast(best_ref[2], jnp.int32)
                    best_uvx = best_ref[3]
                    best_uvy = best_ref[4]
                    best_nx = best_ref[5]
                    best_ny = best_ref[6]
                    best_nz = best_ref[7]
                    best_mat = pltpu.bitcast(best_ref[8], jnp.int32)
                    cur_raw = flag_ref[FI]
                    cur_inst = cur_raw & INST_ID_MASK
                    m = [minv_ref[k] for k in range(12)]
                    for k in range(K):
                        tb = b + k * 9
                        # leaf rows store (a, e1, e2) — edges read directly
                        ax, ay, az = lpos_ref[tb], lpos_ref[tb + 1], lpos_ref[tb + 2]
                        e1x, e1y, e1z = (lpos_ref[tb + 3], lpos_ref[tb + 4],
                                         lpos_ref[tb + 5])
                        e2x, e2y, e2z = (lpos_ref[tb + 6], lpos_ref[tb + 7],
                                         lpos_ref[tb + 8])
                        ptag = lprim_ref[pb + k]
                        px_ = ody * e2z - odz * e2y
                        py_ = odz * e2x - odx * e2z
                        pz_ = odx * e2y - ody * e2x
                        det = e1x * px_ + e1y * py_ + e1z * pz_
                        # division-free Möller-Trumbore (see _make_kernel._leaf);
                        # attributes interpolate in RATIO space: numerators with
                        # barycentric weights (adet-du-dv, du, dv), one divide
                        # per ray at the end
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
                        # ---- attribute interpolation at hit time (ratio) -------
                        dw0 = adet - du - dv
                        kb = ub + k * 6
                        uvx = (dw0 * luv_ref[kb] + du * luv_ref[kb + 2]
                               + dv * luv_ref[kb + 4])
                        uvy = (dw0 * luv_ref[kb + 1] + du * luv_ref[kb + 3]
                               + dv * luv_ref[kb + 5])
                        kn = nb + k * 9
                        n0x, n0y, n0z = lnrm_ref[kn], lnrm_ref[kn + 1], lnrm_ref[kn + 2]
                        n1x, n1y, n1z = lnrm_ref[kn + 3], lnrm_ref[kn + 4], lnrm_ref[kn + 5]
                        n2x, n2y, n2z = lnrm_ref[kn + 6], lnrm_ref[kn + 7], lnrm_ref[kn + 8]
                        nox = dw0 * n0x + du * n1x + dv * n2x
                        noy = dw0 * n0y + du * n1y + dv * n2y
                        noz = dw0 * n0z + du * n1z + dv * n2z
                        # world normal = (M^-1)^T n_obj
                        nwx = m[0] * nox + m[4] * noy + m[8] * noz
                        nwy = m[1] * nox + m[5] * noy + m[9] * noz
                        nwz = m[2] * nox + m[6] * noy + m[10] * noz
                        slot_k = jnp.maximum(ptag, 0) >> 24
                        midx = (jnp.clip(cur_inst, 0, n_inst - 1) * n_slots
                                + jnp.clip(slot_k, 0, n_slots - 1))
                        mat_k = smat_ref[midx]
                        if alpha_test:
                            # leaf cutout (leaf.glsl getAlpha): lens around
                            # v=0.5 with parabolic half-width in u — needs REAL
                            # uv, so the cutout pays one divide per candidate.
                            # Force-opaque instances (record bit 23) skip it
                            # (VK_GEOMETRY_INSTANCE_FORCE_OPAQUE parity).
                            inv_a = 1.0 / jnp.where(ok, adet, 1.0)
                            ruvx = uvx * inv_a
                            ruvy = uvy * inv_a
                            is_leaf = (
                                smodel_ref[jnp.clip(mat_k, 0, n_mats - 1)]
                                == _SHADE_LEAF)
                            curve = (1.0 - (1.0 - 2.0 * ruvx) ** 2) * 0.2
                            leaf_ok = jnp.abs(ruvy - 0.5) < curve
                            forced = (cur_raw & INST_OPAQUE_BIT) != 0
                            hit = hit & (jnp.logical_not(is_leaf) | leaf_ok
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
                    sp = _wide_pushes(stack_ref, flag_ref, sp, is_box, is_inst,
                                      c0, S, inst_ok)
                else:
                    box_i = is_box.astype(jnp.int32)
                    any0 = flag_ref[0] * box_i
                    any1 = flag_ref[1] * box_i
                    first0 = flag_ref[2]
                    near_c = jnp.where(first0 == 1, c0, c1)
                    far_c = jnp.where(first0 == 1, c1, c0)
                    near_ok = jnp.where(first0 == 1, any0, any1)
                    far_ok = jnp.where(first0 == 1, any1, any0)
                    p1 = jnp.where(is_inst, inst_ok, far_ok)
                    p1_val = jnp.where(is_inst, c0, far_c)
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
            st(t_out, sub, jnp.where(miss, jnp.float32(jnp.inf), best_t))
            st(prim_out, sub, best_prim)
            st(inst_out, sub, jnp.where(miss, -1, best_inst))
            st(uvx_out, sub, best_ref[3] * inv_den)
            st(uvy_out, sub, best_ref[4] * inv_den)
            st(nx_out, sub, best_ref[5] * inv_den)
            st(ny_out, sub, best_ref[6] * inv_den)
            st(nz_out, sub, best_ref[7] * inv_den)
            st(mat_out, sub,
               jnp.where(miss, 0, pltpu.bitcast(best_ref[8], jnp.int32)))
            return carry

        if sub_n == 1:
            run(0, 0)
        else:
            jax.lax.fori_loop(0, sub_n, run, 0)


    return kernel


def image_mode_ok(image_shape, n_rays: int) -> bool:
    """Image packet grouping applies when the wavefront is exactly a
    row-major [H, W] image with H % 8 == 0 and W % 128 == 0 (the physical
    T(8,128) tile)."""
    if not image_shape:
        return False
    h, w = image_shape
    return h % 8 == 0 and w % 128 == 0 and h * w == n_rays


def _pack_rays(ray_o, ray_d, t_cap, image_shape, sub_cap: int = 0,
               pack: int = 1):
    """Ray wavefront -> per-component packet blocks + specs.

    Returns (args, ray_spec, out_spec, grid, out_shape_fn, unflatten, sub_n):
    7 component arrays (ox oy oz dx dy dz tmax), the input/output BlockSpecs,
    the packet grid size, a dtype->ShapeDtypeStruct maker for outputs, a fn
    mapping a kernel output back to a flat [r] array, and the number of
    packets per grid step (flat mode groups SUBPACKETS packets per step to
    amortize the ~2.4 us/step block plumbing; image mode runs one tile per
    step, its blocks are already zero-relayout).

    In image mode the tile permutation lives entirely in the index_map over
    (8, 128) blocks of the row-major [H, W] arrays — no transposed arrays
    ever reach the pallas_call (see the ray-ordering NOTE below)."""
    r = ray_o.shape[0]
    if image_mode_ok(image_shape, r):
        h, w = image_shape
        if h % (8 * pack):
            pack = 1          # fat packets need 8*pack-row image blocks
        bh = 8 * pack
        ntx = w // 128
        g = (h // bh) * ntx
        spec = pl.BlockSpec((bh, 128), lambda i: (i // ntx, i % ntx),
                            memory_space=pltpu.VMEM)
        args = [ray_o[:, k].reshape(h, w) for k in range(3)]
        args += [ray_d[:, k].reshape(h, w) for k in range(3)]
        args.append(t_cap.reshape(h, w))
        out_shape = lambda dt: jax.ShapeDtypeStruct((h, w), dt)
        unflatten = lambda x: x.reshape(r)
        return args, spec, spec, g, out_shape, unflatten, 1, pack

    # group SUBPACKETS packets per grid step; a short wavefront degrades
    # gracefully to fewer packets per step (pad rays park dead — see below).
    # sub_cap=0 -> module default, read at call time (bench sweeps patch it)
    fat = PACKET * pack
    sub = max(1, min(sub_cap or SUBPACKETS, -(-r // fat)))
    step = sub * fat
    r_pad = -(-r // step) * step
    g = r_pad // step
    spec = pl.BlockSpec((sub, 8 * pack, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    def comp(x, fill):
        return jnp.pad(x, (0, r_pad - r),
                       constant_values=fill).reshape(g * sub, 8 * pack, 128)

    args = [comp(ray_o[:, k], 0.0) for k in range(3)]
    args += [comp(ray_d[:, k], 1.0) for k in range(3)]
    args.append(comp(t_cap, -3e38))   # pad rays park at origin: see above
    out_shape = lambda dt: jax.ShapeDtypeStruct((g * sub, 8 * pack, 128), dt)
    unflatten = lambda x: x.reshape(r_pad)[:r]
    return args, spec, spec, g, out_shape, unflatten, sub, pack


@partial(
    jax.jit,
    static_argnames=("root_code", "stack_size", "max_steps", "image_shape",
                     "wide", "cull_mask", "sub_cap", "pack"),
)
def trace_resolve_scene_pallas(
    scene: RTScene,
    slot_materials: jax.Array,   # i32[N, S]
    ray_o: jax.Array,
    ray_d: jax.Array,
    t_max: jax.Array,
    *,
    root_code: int,
    stack_size: int,
    max_steps: Optional[int] = None,
    active: Optional[jax.Array] = None,
    shading_model: Optional[jax.Array] = None,  # i32[M]: enables leaf cutout
    image_shape: Optional[Tuple[int, int]] = None,
    wide: bool = False,
    cull_mask: int = 0xFF,
    sub_cap: int = 0,
    pack: int = 1,
):
    """Fused closest-hit + attribute resolve. Returns a dict of flat arrays:
    t, prim, inst, uv f32[R, 2], normal f32[R, 3] (unnormalized world),
    material i32[R]. ``shading_model`` enables the in-kernel leaf-cutout
    any-hit gate. ``image_shape=(H, W)`` groups packets as (8, 128) pixel
    tiles of the row-major image wavefront (see ``image_mode_ok``)."""
    r = ray_o.shape[0]
    t_cap = jnp.asarray(t_max, jnp.float32) + ray_o[:, 0] * 0.0
    if active is not None:
        # -3e38 (not -1): an inactive ray parked at the zero origin
        # sits INSIDE scene boxes, and tn <= -1 still passes for boxes
        # deeper than 1 unit - it would drag every origin-containing
        # box chain into the packet footprint
        t_cap = jnp.where(active, t_cap, -3e38)

    image_mode = image_mode_ok(image_shape, r)
    pack = max(1, min(pack, r // PACKET))
    (ray_args, ray_spec, out_spec, g, out_shape, unflatten, sub,
     pack) = _pack_rays(ray_o, ray_d, t_cap, image_shape, sub_cap=sub_cap,
                        pack=pack)

    boxes, codes, lpos, lprim = _split_scene(scene)
    luv = scene.leaf_rows[:, _UV:].reshape(-1)
    lnrm = scene.leaf_nrm.reshape(-1)
    smat = slot_materials.astype(jnp.int32).reshape(-1)
    n_inst, n_slots = slot_materials.shape
    if max_steps is None:
        max_steps = traversal_step_bound(scene, n_inst)
    # wide steps push up to 3 net entries per pop over half the depth
    eff_stack = (stack_size * 3) // 2 + 2 if wide else stack_size
    assert eff_stack <= _STACK, "scene too deep for the packet kernel"

    alpha_test = shading_model is not None
    n_mats = shading_model.shape[0] if alpha_test else 1
    kernel = _make_resolve_kernel(root_code, max_steps, n_slots, n_inst,
                                  alpha_test=alpha_test, n_mats=n_mats,
                                  image_mode=image_mode, wide=wide,
                                  cull_mask=cull_mask, sub_n=sub, pack=pack)

    smem = lambda n: pl.BlockSpec(
        (n,), lambda i: (0,), memory_space=pltpu.SMEM)

    f32 = jnp.float32
    model_specs = [smem(n_mats)] if alpha_test else []
    model_args = (
        [shading_model.astype(jnp.int32).reshape(-1)] if alpha_test else [])
    out_dts = [f32, jnp.int32, jnp.int32, f32, f32, f32, f32, f32, jnp.int32]
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            smem(boxes.shape[0]), smem(codes.shape[0]),
            smem(lpos.shape[0]), smem(lprim.shape[0]),
            smem(luv.shape[0]), smem(lnrm.shape[0]), smem(smat.shape[0]),
        ] + model_specs + [ray_spec] * 7,
        out_specs=[out_spec] * 9,
        out_shape=[out_shape(dt) for dt in out_dts],
        scratch_shapes=[
            pltpu.VMEM((9, 8 * pack, 128), jnp.float32),   # object-space ray
            pltpu.VMEM((11, 8 * pack, 128), jnp.float32),  # best (+den+prune)
            pltpu.SMEM((12 if wide else 8,), jnp.int32),  # cross-branch scalars
            pltpu.SMEM((12,), jnp.float32),         # current instance inverse
            pltpu.SMEM((_STACK + 1,), jnp.int32),   # scalar stack + trash slot
        ],
        interpret=INTERPRET,
    )(boxes, codes, lpos, lprim, luv, lnrm, smat,
      *model_args, *ray_args)

    flat = [unflatten(x) for x in outs]
    t_f, prim_f, inst_f, uvx, uvy, nx, ny, nz, mat = flat
    return {
        "t": t_f, "prim": prim_f, "inst": inst_f,
        "uv": jnp.stack([uvx, uvy], axis=-1),
        "normal": jnp.stack([nx, ny, nz], axis=-1),
        "material": mat,
    }


def _pack_planes(comps, fills, sub_cap: int = 0, pack: int = 1):
    """Generic flat-mode packet packing: [r] components -> (g*sub, 8, 128)
    blocks + specs (the variable-arity cousin of ``_pack_rays`` for bundle
    kernels). Returns (args, spec, grid, out_shape_fn, unflatten, sub)."""
    r = comps[0].shape[0]
    fat = PACKET * pack
    sub = max(1, min(sub_cap or SUBPACKETS, -(-r // fat)))
    step = sub * fat
    r_pad = -(-r // step) * step
    g = r_pad // step
    spec = pl.BlockSpec((sub, 8 * pack, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    args = [jnp.pad(x, (0, r_pad - r),
                    constant_values=f).reshape(g * sub, 8 * pack, 128)
            for x, f in zip(comps, fills)]
    out_shape = lambda dt: jax.ShapeDtypeStruct((g * sub, 8 * pack, 128), dt)
    unflatten = lambda x: x.reshape(r_pad)[:r]
    return args, spec, g, out_shape, unflatten, sub, pack


def _make_bundle_kernel(root_code: int, max_steps: int, s_n: int,
                        ao_n: int = 0, rs_n: int = 0, n_slots: int = 1,
                        n_inst: int = 1, wide: bool = False,
                        cull_mask: int = 0xFF, sub_n: int = 1,
                        pack: int = 1):
    """Origin-shared BUNDLE kernel: S rays per lane share one origin and run
    ONE traversal over the union footprint — the per-sample footprints
    overlap heavily near the shared origin (and exactly for soft-shadow
    samples toward one light), so S samples cost ~1 traversal instead of S
    wavefront launches.

    Two per-sample semantics (samples ordered occlusion-first):
      * the first ``s_n - ao_n`` samples are ANY-HIT occlusion (shadow)
        rays: state = one prune plane (commit = prune -> -3e38); output =
        a bit in the i32 bitmask plane (raytrace.rchit:61-116 parity via
        shadow_visibility).
      * the next ``ao_n`` samples are CLOSEST-T rays (RTAO needs the hit
        distance for its 1 - t/radius weighting, raytrace.rchit:175-219):
        state = ratio-space (num, den) winner planes (division-free
        Möller-Trumbore, see _make_resolve_kernel) + the prune plane
        refreshed with ONE divide per leaf step; output = final t
        (= t_cap when nothing closer hit, which makes the AO weight 0).
      * the last ``rs_n`` (0/1) sample is a CLOSEST-HIT + RESOLVE ray (the
        1-bounce reflection, raytrace.rchit:124-167): the full
        _make_resolve_kernel winner state (t/prim/inst/uv/normal/material
        interpolated at hit time in ratio space) rides the same traversal —
        the bounce shares its near-field footprint with the shadow/AO
        samples, so the union costs far less than a separate wavefront.

    Inactive lanes park at t_cap=-3e38 per SAMPLE (zero footprint AND
    transparent to the all-committed early exit). The early exit only
    applies when ao_n == rs_n == 0 (closest samples are never "done" early).

    Box child ordering keys use the min entry over lanes AND samples; the
    ``wide`` grandchild step mirrors ``_wide_box_step`` with the per-sample
    slab union folded into each child's key."""
    S = _STACK
    V = (8 * pack, 128)      # packet vector shape (pack sub-blocks, one stack)
    FI = 8 if wide else 3
    FH = 9 if wide else 4
    occ_n = s_n - ao_n - rs_n
    RS = s_n + 2 * ao_n   # base of the resolve sample's winner planes

    def kernel(boxes_ref, codes_ref, lpos_ref, lprim_ref, *rest):
        if rs_n:
            luv_ref, lnrm_ref, smat_ref = rest[:3]
            rest = rest[3:]
        nray = 3 + 4 * s_n
        ray_refs = rest[:nray]
        occ_out = rest[nray]
        ao_outs = rest[nray + 1: nray + 1 + ao_n]
        rs_outs = rest[nray + 1 + ao_n: nray + 1 + ao_n + 9 * rs_n]
        if rs_n:
            (obj_ref, prune_ref, flag_ref, minv_ref,
             stack_ref) = rest[nray + 1 + ao_n + 9:]
        else:
            obj_ref, prune_ref, flag_ref, stack_ref = rest[nray + 1 + ao_n:]

        def run(sub, carry):
            ld = lambda ref: ref[sub]
            wox, woy, woz = ld(ray_refs[0]), ld(ray_refs[1]), ld(ray_refs[2])
            wds = [(ld(ray_refs[3 + 3 * s]), ld(ray_refs[4 + 3 * s]),
                    ld(ray_refs[5 + 3 * s])) for s in range(s_n)]
            tcs = [ld(ray_refs[3 + 3 * s_n + s]) for s in range(s_n)]

            def safe_inv(x):
                return 1.0 / jnp.where(jnp.abs(x) < 1e-12, 1e-12, x)

            wis = [tuple(safe_inv(c) for c in d) for d in wds]

            # obj planes: [0..2]=origin, then per sample d(3), then inv(3)
            obj_ref[0] = wox
            obj_ref[1] = woy
            obj_ref[2] = woz
            for s in range(s_n):
                for c in range(3):
                    obj_ref[3 + 3 * s + c] = wds[s][c]
                    obj_ref[3 + 3 * s_n + 3 * s + c] = wis[s][c]
            for s in range(s_n):
                prune_ref[s] = tcs[s]
            for j in range(ao_n):
                prune_ref[s_n + j] = tcs[occ_n + j]          # num (t winner)
                prune_ref[s_n + ao_n + j] = jnp.ones(V, jnp.float32)
            if rs_n:
                neg1 = pltpu.bitcast(
                    jnp.full(V, -1, jnp.int32), jnp.float32)
                zero_i = pltpu.bitcast(
                    jnp.zeros(V, jnp.int32), jnp.float32)
                prune_ref[RS + 0] = tcs[occ_n + ao_n]        # num (t winner)
                prune_ref[RS + 1] = jnp.ones(V, jnp.float32)  # den
                prune_ref[RS + 2] = neg1                     # prim
                prune_ref[RS + 3] = neg1                     # inst
                for i in range(4, 9):                        # uv + normal
                    prune_ref[RS + i] = jnp.zeros(V, jnp.float32)
                prune_ref[RS + 9] = zero_i                   # material
                for k in range(12):
                    minv_ref[k] = jnp.float32(
                        1.0 if k in (0, 5, 10) else 0.0)
            flag_ref[FI] = jnp.int32(0)
            flag_ref[FH] = jnp.int32(0)
            stack_ref[0] = jnp.int32(root_code)

            def cond(st):
                step, sp, done = st
                return (sp > 0) & (step < max_steps) & (done == 0)

            def body(st):
                step, sp, done = st
                sp = sp - 1
                code = stack_ref[sp]
                typ = (code >> _TYPE_SHIFT) & 3
                payload = code & _PAYLOAD_MASK
                obj = ((code >> 30) & 1) == 1
                is_box = typ == TYPE_BOX
                is_leaf = typ == TYPE_LEAF
                is_inst = typ == TYPE_INST
                c0 = codes_ref[payload * 2]
                c1 = codes_ref[payload * 2 + 1]
                inst_ok = (((c1 >> 24) & cull_mask) != 0).astype(jnp.int32)

                @pl.when(is_box)
                def _box():
                    px = jnp.where(obj, obj_ref[0], wox)
                    py = jnp.where(obj, obj_ref[1], woy)
                    pz = jnp.where(obj, obj_ref[2], woz)
                    ivs = [tuple(
                        jnp.where(obj, obj_ref[3 + 3 * s_n + 3 * s + c],
                                  wis[s][c]) for c in range(3))
                        for s in range(s_n)]
                    prunes = [prune_ref[s] for s in range(s_n)]

                    def slab(bb):
                        lx, ly, lz = (boxes_ref[bb], boxes_ref[bb + 1],
                                      boxes_ref[bb + 2])
                        hx, hy, hz = (boxes_ref[bb + 3], boxes_ref[bb + 4],
                                      boxes_ref[bb + 5])
                        inf = jnp.float32(3e38)
                        key = jnp.float32(3e38)
                        for s in range(s_n):
                            ix, iy, iz = ivs[s]
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
                            hit = ((tf >= jnp.maximum(tn, 0.0))
                                   & (tn <= prunes[s]) & (lx <= hx))
                            key = jnp.minimum(
                                key, jnp.min(jnp.where(hit, tn, inf)))
                        return key

                    if wide:
                        inf = jnp.float32(3e38)
                        keys = []
                        codes = []
                        for side, cs in ((0, c0), (1, c1)):
                            is_b = ((cs >> _TYPE_SHIFT) & 3) == TYPE_BOX
                            gp = jnp.where(is_b, cs & _PAYLOAD_MASK, 0)
                            keys.append(slab(jnp.where(
                                is_b, gp * 12, payload * 12 + side * 6)))
                            codes.append(jnp.where(is_b, codes_ref[gp * 2],
                                                   cs))
                            k1 = slab(gp * 12 + 6)
                            keys.append(jnp.where(is_b, k1, inf))
                            codes.append(codes_ref[gp * 2 + 1])
                        for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
                            a, b = keys[i], keys[j]
                            ca, cb = codes[i], codes[j]
                            sw = a > b
                            keys[i] = jnp.where(sw, b, a)
                            keys[j] = jnp.where(sw, a, b)
                            codes[i] = jnp.where(sw, cb, ca)
                            codes[j] = jnp.where(sw, ca, cb)
                        for k in range(4):
                            e = 3 - k
                            flag_ref[k] = (keys[e] < inf).astype(jnp.int32)
                            flag_ref[4 + k] = codes[e]
                    else:
                        b = payload * 12
                        t0m = slab(b)
                        t1m = slab(b + 6)
                        inf = jnp.float32(3e38)
                        flag_ref[0] = (t0m < inf).astype(jnp.int32)
                        flag_ref[1] = (t1m < inf).astype(jnp.int32)
                        flag_ref[2] = (t0m <= t1m).astype(jnp.int32)

                @pl.when(is_inst)
                def _inst():
                    b = payload * 12
                    m = [boxes_ref[b + k] for k in range(12)]
                    obj_ref[0] = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
                    obj_ref[1] = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
                    obj_ref[2] = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
                    for s in range(s_n):
                        dx, dy, dz = wds[s]
                        odx = m[0] * dx + m[1] * dy + m[2] * dz
                        ody = m[4] * dx + m[5] * dy + m[6] * dz
                        odz = m[8] * dx + m[9] * dy + m[10] * dz
                        obj_ref[3 + 3 * s] = odx
                        obj_ref[4 + 3 * s] = ody
                        obj_ref[5 + 3 * s] = odz
                        obj_ref[3 + 3 * s_n + 3 * s] = safe_inv(odx)
                        obj_ref[4 + 3 * s_n + 3 * s] = safe_inv(ody)
                        obj_ref[5 + 3 * s_n + 3 * s] = safe_inv(odz)
                    flag_ref[FI] = c1
                    if rs_n:
                        for k in range(12):
                            minv_ref[k] = m[k]

                @pl.when(is_leaf)
                def _leaf():
                    b = payload * 72
                    pb = payload * K
                    oox, ooy, ooz = obj_ref[0], obj_ref[1], obj_ref[2]
                    ods = [(obj_ref[3 + 3 * s], obj_ref[4 + 3 * s],
                            obj_ref[5 + 3 * s]) for s in range(s_n)]
                    prunes = [prune_ref[s] for s in range(s_n)]
                    committed = [prunes[s] < jnp.float32(-1e38)
                                 for s in range(occ_n)]
                    nums = [prune_ref[s_n + j] for j in range(ao_n)]
                    dens = [prune_ref[s_n + ao_n + j] for j in range(ao_n)]
                    if rs_n:
                        rnum = prune_ref[RS + 0]
                        rden = prune_ref[RS + 1]
                        rprim = pltpu.bitcast(prune_ref[RS + 2], jnp.int32)
                        rinst = pltpu.bitcast(prune_ref[RS + 3], jnp.int32)
                        ruvx, ruvy = prune_ref[RS + 4], prune_ref[RS + 5]
                        rnx, rny, rnz = (prune_ref[RS + 6], prune_ref[RS + 7],
                                         prune_ref[RS + 8])
                        rmat = pltpu.bitcast(prune_ref[RS + 9], jnp.int32)
                        cur_raw = flag_ref[FI]
                        cur_inst = cur_raw & INST_ID_MASK
                        m = [minv_ref[k] for k in range(12)]
                        ub = payload * 48
                        nb = payload * 72
                    for k in range(K):
                        tb = b + k * 9
                        ax, ay, az = (lpos_ref[tb], lpos_ref[tb + 1],
                                      lpos_ref[tb + 2])
                        e1x, e1y, e1z = (lpos_ref[tb + 3], lpos_ref[tb + 4],
                                         lpos_ref[tb + 5])
                        e2x, e2y, e2z = (lpos_ref[tb + 6], lpos_ref[tb + 7],
                                         lpos_ref[tb + 8])
                        ptag = lprim_ref[pb + k]
                        sx, sy, sz = oox - ax, ooy - ay, ooz - az
                        # q = cross(s, e1) is SAMPLE-INDEPENDENT (origin
                        # shared): hoisted out of the per-sample loop
                        qx = sy * e1z - sz * e1y
                        qy = sz * e1x - sx * e1z
                        qz = sx * e1y - sy * e1x
                        for s in range(s_n):
                            odx, ody, odz = ods[s]
                            px_ = ody * e2z - odz * e2y
                            py_ = odz * e2x - odx * e2z
                            pz_ = odx * e2y - ody * e2x
                            det = e1x * px_ + e1y * py_ + e1z * pz_
                            sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                            adet = jnp.abs(det)
                            ok = adet > 1e-12
                            du = (sx * px_ + sy * py_ + sz * pz_) * sgn
                            dv = (odx * qx + ody * qy + odz * qz) * sgn
                            dt = (e2x * qx + e2y * qy + e2z * qz) * sgn
                            base = (ok & (du >= 0.0) & (dv >= 0.0)
                                    & (du + dv <= adet)
                                    & (dt > 1e-3 * adet)
                                    & (ptag >= 0))
                            if s < occ_n:
                                hit = base & (dt < prunes[s] * adet)
                                committed[s] = committed[s] | hit
                            elif s < occ_n + ao_n:
                                j = s - occ_n
                                hit = base & (dt * dens[j] < nums[j] * adet)
                                nums[j] = jnp.where(hit, dt, nums[j])
                                dens[j] = jnp.where(hit, adet, dens[j])
                            else:
                                # resolve sample: full winner state +
                                # at-hit attribute interpolation in ratio
                                # space (see _make_resolve_kernel._leaf)
                                hit = base & (dt * rden < rnum * adet)
                                dw0 = adet - du - dv
                                kb = ub + k * 6
                                uvx = (dw0 * luv_ref[kb]
                                       + du * luv_ref[kb + 2]
                                       + dv * luv_ref[kb + 4])
                                uvy = (dw0 * luv_ref[kb + 1]
                                       + du * luv_ref[kb + 3]
                                       + dv * luv_ref[kb + 5])
                                kn = nb + k * 9
                                nox = (dw0 * lnrm_ref[kn]
                                       + du * lnrm_ref[kn + 3]
                                       + dv * lnrm_ref[kn + 6])
                                noy = (dw0 * lnrm_ref[kn + 1]
                                       + du * lnrm_ref[kn + 4]
                                       + dv * lnrm_ref[kn + 7])
                                noz = (dw0 * lnrm_ref[kn + 2]
                                       + du * lnrm_ref[kn + 5]
                                       + dv * lnrm_ref[kn + 8])
                                # world normal = (M^-1)^T n_obj
                                nwx = m[0] * nox + m[4] * noy + m[8] * noz
                                nwy = m[1] * nox + m[5] * noy + m[9] * noz
                                nwz = m[2] * nox + m[6] * noy + m[10] * noz
                                slot_k = jnp.maximum(ptag, 0) >> 24
                                midx = (jnp.clip(cur_inst, 0, n_inst - 1)
                                        * n_slots
                                        + jnp.clip(slot_k, 0, n_slots - 1))
                                mat_k = smat_ref[midx]
                                rprim = jnp.where(hit, ptag & 0x00FFFFFF,
                                                  rprim)
                                rinst = jnp.where(hit, cur_inst, rinst)
                                ruvx = jnp.where(hit, uvx, ruvx)
                                ruvy = jnp.where(hit, uvy, ruvy)
                                rnx = jnp.where(hit, nwx, rnx)
                                rny = jnp.where(hit, nwy, rny)
                                rnz = jnp.where(hit, nwz, rnz)
                                rmat = jnp.where(hit, mat_k, rmat)
                                rnum = jnp.where(hit, dt, rnum)
                                rden = jnp.where(hit, adet, rden)
                    for s in range(occ_n):
                        prune_ref[s] = jnp.where(committed[s],
                                                 jnp.float32(-3e38),
                                                 prune_ref[s])
                    for j in range(ao_n):
                        prune_ref[s_n + j] = nums[j]
                        prune_ref[s_n + ao_n + j] = dens[j]
                        # ONE divide per leaf step refreshes the box prune
                        prune_ref[occ_n + j] = nums[j] / dens[j]
                    if rs_n:
                        prune_ref[RS + 0] = rnum
                        prune_ref[RS + 1] = rden
                        prune_ref[RS + 2] = pltpu.bitcast(rprim, jnp.float32)
                        prune_ref[RS + 3] = pltpu.bitcast(rinst, jnp.float32)
                        prune_ref[RS + 4] = ruvx
                        prune_ref[RS + 5] = ruvy
                        prune_ref[RS + 6] = rnx
                        prune_ref[RS + 7] = rny
                        prune_ref[RS + 8] = rnz
                        prune_ref[RS + 9] = pltpu.bitcast(rmat, jnp.float32)
                        prune_ref[occ_n + ao_n] = rnum / rden
                    if ao_n == 0 and rs_n == 0:
                        allc = jnp.bool_(True)
                        for s in range(occ_n):
                            allc = allc & committed[s]
                        flag_ref[FH] = jnp.all(allc).astype(jnp.int32)

                if wide:
                    sp = _wide_pushes(stack_ref, flag_ref, sp, is_box,
                                      is_inst, c0, S, inst_ok)
                else:
                    box_i = is_box.astype(jnp.int32)
                    any0 = flag_ref[0] * box_i
                    any1 = flag_ref[1] * box_i
                    first0 = flag_ref[2]
                    near_c = jnp.where(first0 == 1, c0, c1)
                    far_c = jnp.where(first0 == 1, c1, c0)
                    near_ok = jnp.where(first0 == 1, any0, any1)
                    far_ok = jnp.where(first0 == 1, any1, any0)
                    p1 = jnp.where(is_inst, inst_ok, far_ok)
                    p1_val = jnp.where(is_inst, c0, far_c)
                    stack_ref[
                        jnp.where(p1 == 1, jnp.minimum(sp, S - 1), S)] = p1_val
                    sp = sp + p1
                    stack_ref[
                        jnp.where(near_ok == 1, jnp.minimum(sp, S - 1), S)
                    ] = near_c
                    sp = sp + near_ok
                done = flag_ref[FH]
                return step + 1, sp, done

            jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(1), jnp.int32(0)))

            bits = jnp.zeros(V, jnp.int32)
            for s in range(occ_n):
                occ = prune_ref[s] < jnp.float32(-1e38)
                bits = bits | (occ.astype(jnp.int32) << s)
            occ_out[sub] = bits
            for j in range(ao_n):
                ao_outs[j][sub] = prune_ref[s_n + j] / prune_ref[s_n + ao_n + j]
            if rs_n:
                inv_den = 1.0 / prune_ref[RS + 1]
                best_t = prune_ref[RS + 0] * inv_den
                rprim = pltpu.bitcast(prune_ref[RS + 2], jnp.int32)
                rinst = pltpu.bitcast(prune_ref[RS + 3], jnp.int32)
                miss = rprim < 0
                rs_outs[0][sub] = jnp.where(miss, jnp.float32(jnp.inf),
                                            best_t)
                rs_outs[1][sub] = rprim
                rs_outs[2][sub] = jnp.where(miss, -1, rinst)
                rs_outs[3][sub] = prune_ref[RS + 4] * inv_den
                rs_outs[4][sub] = prune_ref[RS + 5] * inv_den
                rs_outs[5][sub] = prune_ref[RS + 6] * inv_den
                rs_outs[6][sub] = prune_ref[RS + 7] * inv_den
                rs_outs[7][sub] = prune_ref[RS + 8] * inv_den
                rs_outs[8][sub] = jnp.where(
                    miss, 0, pltpu.bitcast(prune_ref[RS + 9], jnp.int32))
            return carry

        if sub_n == 1:
            run(0, 0)
        else:
            jax.lax.fori_loop(0, sub_n, run, 0)

    return kernel


@partial(
    jax.jit,
    static_argnames=("root_code", "stack_size", "max_steps", "wide",
                     "cull_mask", "sub_cap", "pack"),
)
def trace_bundle_pallas(
    scene: RTScene,
    ray_o: jax.Array,                 # f32[R, 3] shared origins
    occ_ds,                           # tuple of f32[R, 3], any-hit samples
    occ_tcs,                          # tuple of f32[R] (or scalar) per sample
    ao_ds=(),                         # tuple of f32[R, 3], closest-t samples
    ao_tcs=(),                        # tuple of f32[R] (or scalar) per sample
    rs_d=None,                        # f32[R, 3]: closest+resolve sample
    rs_tc=None,                       # f32[R] (or scalar)
    slot_materials=None,              # i32[N, S], required with rs_d
    *,
    root_code: int,
    stack_size: int,
    max_steps: Optional[int] = None,
    occ_actives=None,                 # tuple of bool[R] | None, per sample
    ao_actives=None,                  # tuple of bool[R] | None, per sample
    rs_active=None,                   # bool[R] | None
    wide: bool = False,
    cull_mask: int = 0xFF,
    sub_cap: int = 0,
    pack: int = 1,
):
    """S origin-shared rays per lane in ONE traversal: any-hit occlusion
    samples (shadows) + closest-t samples (RTAO) + at most one closest-hit
    RESOLVE sample (the 1-bounce reflection) mixed. Returns ``(bits,
    ao_ts)`` — i32[R] bitmask (bit s set = occlusion sample s hit before
    its t_cap; inactive lanes report all-occluded — callers mask) and a
    tuple of f32[R] closest-t per AO sample (= its t_cap when nothing
    closer hit; -3e38 on inactive lanes) — plus, when ``rs_d`` is given, a
    dict of resolved-hit arrays (t/prim/inst/uv/normal/material, the
    trace_resolve_scene_pallas output contract). One wavefront launch
    replaces S; same-origin samples' footprints overlap near the origin,
    so the union costs far less than S separate traversals."""
    occ_n = len(occ_ds)
    ao_n = len(ao_ds)
    rs_n = 0 if rs_d is None else 1
    s_n = occ_n + ao_n + rs_n
    assert s_n >= 1 and occ_n <= 30
    r = ray_o.shape[0]
    comps = [ray_o[:, 0], ray_o[:, 1], ray_o[:, 2]]
    fills = [0.0, 0.0, 0.0]
    rs_ds = (rs_d,) if rs_n else ()
    for d in tuple(occ_ds) + tuple(ao_ds) + rs_ds:
        comps += [d[:, 0], d[:, 1], d[:, 2]]
        fills += [1.0, 1.0, 1.0]
    all_tcs = tuple(occ_tcs) + tuple(ao_tcs) + ((rs_tc,) if rs_n else ())
    all_act = tuple(occ_actives or (None,) * occ_n) + \
        tuple(ao_actives or (None,) * ao_n) + \
        ((rs_active,) if rs_n else ())
    for tc, act in zip(all_tcs, all_act):
        t = jnp.asarray(tc, jnp.float32) + ray_o[:, 0] * 0.0
        if act is not None:
            t = jnp.where(act, t, -3e38)   # parked: zero footprint
        comps.append(t)
        fills.append(-3e38)

    pack = max(1, min(pack, r // PACKET))
    args, spec, g, out_shape, unflatten, sub, pack = _pack_planes(
        comps, fills, sub_cap=sub_cap, pack=pack)

    boxes, codes, lpos, lprim = _split_scene(scene)
    if max_steps is None:
        max_steps = scene.nodes.shape[0] + scene.leaf_rows.shape[0] + 64
    eff_stack = (stack_size * 3) // 2 + 2 if wide else stack_size
    assert eff_stack <= _STACK, "scene too deep for the packet kernel"

    smem = lambda n: pl.BlockSpec(
        (n,), lambda i: (0,), memory_space=pltpu.SMEM)
    f32 = jnp.float32
    model_specs, model_args = [], []
    n_slots = n_inst = 1
    if rs_n:
        luv = scene.leaf_rows[:, _UV:].reshape(-1)
        lnrm = scene.leaf_nrm.reshape(-1)
        smat = slot_materials.astype(jnp.int32).reshape(-1)
        n_inst, n_slots = slot_materials.shape
        model_specs = [smem(luv.shape[0]), smem(lnrm.shape[0]),
                       smem(smat.shape[0])]
        model_args = [luv, lnrm, smat]

    kernel = _make_bundle_kernel(root_code, max_steps, s_n, ao_n=ao_n,
                                 rs_n=rs_n, n_slots=n_slots, n_inst=n_inst,
                                 wide=wide, cull_mask=cull_mask, sub_n=sub,
                                 pack=pack)
    rs_dts = [f32, jnp.int32, jnp.int32, f32, f32, f32, f32, f32, jnp.int32]
    scratch = [
        pltpu.VMEM((3 + 6 * s_n, 8 * pack, 128), jnp.float32),  # o + d/inv
        # per-sample prune planes + (num, den) winners per AO sample
        # + the resolve sample's 10 winner planes
        pltpu.VMEM((s_n + 2 * ao_n + 10 * rs_n, 8 * pack, 128), jnp.float32),
        pltpu.SMEM((12 if wide else 8,), jnp.int32),
    ]
    if rs_n:
        scratch.append(pltpu.SMEM((12,), jnp.float32))   # instance inverse
    scratch.append(pltpu.SMEM((_STACK + 1,), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            smem(boxes.shape[0]), smem(codes.shape[0]),
            smem(lpos.shape[0]), smem(lprim.shape[0]),
        ] + model_specs + [spec] * len(comps),
        out_specs=[spec] * (1 + ao_n + 9 * rs_n),
        out_shape=[out_shape(jnp.int32)] + [out_shape(f32)] * ao_n
        + [out_shape(dt) for dt in (rs_dts if rs_n else [])],
        scratch_shapes=scratch,
        interpret=INTERPRET,
    )(boxes, codes, lpos, lprim, *model_args, *args)
    bits = unflatten(outs[0])
    ao_ts = tuple(unflatten(x) for x in outs[1:1 + ao_n])
    if not rs_n:
        return bits, ao_ts
    t_f, prim_f, inst_f, uvx, uvy, nx, ny, nz, mat = (
        unflatten(x) for x in outs[1 + ao_n:])
    rs_out = dict(
        t=t_f, prim=prim_f, inst=inst_f,
        uv=jnp.stack([uvx, uvy], axis=-1),
        normal=jnp.stack([nx, ny, nz], axis=-1),
        material=mat,
    )
    return bits, ao_ts, rs_out


def trace_shadow_bundle_pallas(
    scene: RTScene,
    ray_o: jax.Array,
    ray_ds,
    t_caps,
    *,
    root_code: int,
    stack_size: int,
    max_steps: Optional[int] = None,
    active: Optional[jax.Array] = None,
    wide: bool = False,
    cull_mask: int = 0xFF,
    sub_cap: int = 0,
    pack: int = 1,
) -> jax.Array:
    """All-occlusion bundle (the original shadow-only surface): S any-hit
    origin-shared rays -> i32[R] occlusion bitmask. See trace_bundle_pallas."""
    s_n = len(ray_ds)
    bits, _ = trace_bundle_pallas(
        scene, ray_o, tuple(ray_ds), tuple(t_caps),
        root_code=root_code, stack_size=stack_size, max_steps=max_steps,
        occ_actives=None if active is None else (active,) * s_n,
        wide=wide, cull_mask=cull_mask, sub_cap=sub_cap, pack=pack,
    )
    return bits


# NOTE on ray ordering (measured on TPU v5e, example scene, 1M rays):
#   * gather-based octant/morton ray sorting: ~30 ns/row per permutation
#     (8 permutations = ~90 ms) — dominated the whole trace;
#   * transpose-based (8, 128)-pixel tiling: the transposes are free, but
#     feeding transpose-produced arrays into pallas_call made the kernel
#     ~9x slower (layout/materialization effect — even when the tiled packet
#     CONTENTS were bit-identical to the identity order at w=128);
#   * identity row-major order: packets are ~1024-pixel row strips, already
#     frustum-coherent for primary rays and surface-local for secondary
#     wavefronts. 20.8 Mrays/s on the example scene. This is the shipped
#     ordering; revisit tiling only together with the layout mystery.


@partial(
    jax.jit,
    static_argnames=("root_code", "stack_size", "any_hit", "debug_steps",
                     "max_steps", "image_shape", "wide", "cull_mask",
                     "sub_cap", "pack"),
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
    max_steps: Optional[int] = None,
    active: Optional[jax.Array] = None,
    debug_steps: bool = False,
    image_shape: Optional[Tuple[int, int]] = None,
    wide: bool = False,
    cull_mask: int = 0xFF,
    sub_cap: int = 0,
    pack: int = 1,
) -> HitRecord2:
    """Packet-traversal front end: rays run in their given order (pixel-major
    wavefronts are already strip-coherent — see ordering note above), or as
    (8, 128) pixel tiles when ``image_shape`` applies (``image_mode_ok``)."""
    r = ray_o.shape[0]
    t_cap = jnp.asarray(t_max, jnp.float32) + ray_o[:, 0] * 0.0
    if active is not None:
        # -3e38 (not -1): an inactive ray parked at the zero origin
        # sits INSIDE scene boxes, and tn <= -1 still passes for boxes
        # deeper than 1 unit - it would drag every origin-containing
        # box chain into the packet footprint
        t_cap = jnp.where(active, t_cap, -3e38)   # never hits, never pushes

    image_mode = image_mode_ok(image_shape, r)
    pack = max(1, min(pack, r // PACKET))
    (ray_args, ray_spec, out_spec, g, out_shape, unflatten, sub,
     pack) = _pack_rays(ray_o, ray_d, t_cap, image_shape, sub_cap=sub_cap,
                        pack=pack)

    boxes, codes, lpos, lprim = _split_scene(scene)
    if max_steps is None:
        # conservative single-visit bound; callers with shared BLASes pass
        # traversal_step_bound(scene, n_instances) (see SceneTracer)
        max_steps = scene.nodes.shape[0] + scene.leaf_rows.shape[0] + 64
    # wide steps push up to 3 net entries per pop over half the depth
    eff_stack = (stack_size * 3) // 2 + 2 if wide else stack_size
    assert eff_stack <= _STACK, "scene too deep for the packet kernel"

    kernel = _make_kernel(root_code, max_steps, any_hit,
                          debug_steps=debug_steps, image_mode=image_mode,
                          wide=wide, cull_mask=cull_mask, sub_n=sub,
                          pack=pack)

    smem = lambda n: pl.BlockSpec(
        (n,), lambda i: (0,), memory_space=pltpu.SMEM)

    f32 = jnp.float32
    out_dts = [f32, jnp.int32, jnp.int32, f32, f32]
    t_r, prim_r, inst_r, u_r, v_r = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            smem(boxes.shape[0]), smem(codes.shape[0]),
            smem(lpos.shape[0]), smem(lprim.shape[0]),
        ] + [ray_spec] * 7,
        out_specs=[out_spec] * 5,
        out_shape=[out_shape(dt) for dt in out_dts],
        scratch_shapes=[
            pltpu.VMEM((9, 8 * pack, 128), jnp.float32),   # object-space ray
            pltpu.VMEM((7, 8 * pack, 128), jnp.float32),   # best + prune + den
            pltpu.SMEM((12 if wide else 8,), jnp.int32),  # cross-branch scalars
            pltpu.SMEM((_STACK + 1,), jnp.int32),   # scalar stack + trash slot
        ],
        interpret=INTERPRET,
    )(boxes, codes, lpos, lprim, *ray_args)

    return HitRecord2(
        t=unflatten(t_r), prim=unflatten(prim_r), inst=unflatten(inst_r),
        bary=jnp.stack([unflatten(u_r), unflatten(v_r)], axis=-1),
    )
