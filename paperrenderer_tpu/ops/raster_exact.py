"""Triangle-exact binned Pallas rasterizer (round-2 raster core).

Replaces the chunk-granularity work-queue (ops/raster_pallas.py): that kernel
evaluated whole 128-triangle morton chunks against every tile their combined
AABB touched — at 10k instances @1080p that is ~5.6M triangle-tile
evaluations for ~0.55M exact overlaps (12.8 tiles/chunk vs 1.24 tiles/tri),
plus an 8.3M-element scatter to build its work list (~66 ms alone).

This module bins at GROUP=8-triangle granularity (morton-ordered groups are
spatially tight: ~2.0 tiles/group -> ~0.87M evaluations) and builds the work
list with small dynamic ops only (cumsum + fill-forward + one sort at pair
count, not tiles x chunks):

  1. group screen AABBs -> tile spans -> per-group pair counts;
  2. exclusive-cumsum offsets; scatter group ids at run starts into the pair
     array; ``lax.cummax`` fill-forward expands runs (no per-pair searchsorted);
  3. decode each pair's tile from its rank within the group's span;
  4. one ``lax.sort`` by tile groups pairs tile-contiguously; per-tile lists
     are padded to the kernel's step size so no step straddles tiles;
  5. ONE row gather pulls each pair's 8 packed triangle rows (coefficients +
     shading attributes) into a dense, step-ordered buffer the kernel streams
     as plain contiguous blocks — no in-kernel gathers, no multi-slot DMA.

Two depth schemes share the kernels. The CLASSIC scheme packs (quantized
sortable depth | lane id) into a single u32 key so the per-chunk winner is
ONE u32 min-reduce — no argmin, no one-hot barycentric selects, and only two
state planes (key, pair-space tid); depth is quantized by zeroing the low 7
mantissa bits (~2^-16 relative), ties resolving to the lowest lane id,
deterministically. The DEFAULT opaque quarter path (``CROSSZ_DEFAULT``)
instead carries EXACT depth as a (zn, wn) numerator/denominator pair in
three state planes and compares candidates by cross-multiplication — no
per-candidate divide (see ``_make_kernel_quarter``); depth-peel windows
still use the quantized keys. Barycentrics are recomputed at resolve time
from the gathered coefficient rows either way.

Replaces the Vulkan hardware rasterizer + ROP fed by the GPU-driven draw list
(reference: src/PaperRenderer/IndirectDraw.cpp:207-242, RenderPass.cpp:472-558).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import TriangleBatch, triangle_coefficients

TILE_H = 8
TILE_W = 128
GROUP = 8          # triangles per bin entry
BP = 16            # groups (= bin entries) per kernel step -> 128 tris/step
C = GROUP * BP     # triangles evaluated per kernel step
ROW = 32           # packed per-triangle row: 15 coef + pad + 9 n + 6 uv + 1 mat
# python ints (weak-typed scalars): jnp constants would be captured by the
# kernel tracer, which pallas_call rejects. Depth keys are the raw f32 bits
# of the (clipped nonnegative) depth — nonnegative floats sort directly as
# int32, so no sign-fold is needed; SENTINEL = int32 max never loses a min.
SENTINEL = 0x7FFFFFFF
_LANE_MASK = C - 1                      # low bits carrying the lane id
_KEY_MASK = ~(C - 1)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# default raster path: quarter-tile kernel (see _make_kernel_quarter);
# the classic full-tile kernel stays selectable for comparison/fallback
QUARTER_DEFAULT = True
# default depth scheme for the opaque quarter path: cross-multiplied (zn, wn)
# winner state instead of a per-candidate divide (see _make_kernel_quarter)
CROSSZ_DEFAULT = True


def default_pair_capacity(
    width: int, height: int, tri_capacity: int,
    quarter: Optional[bool] = None,
) -> int:
    """Default work capacity used when callers pass none. Classic path:
    (group, tile) pair slots — one step's worth per tile plus ~3 tiles per
    8-triangle group. Quarter path: (group, quarter)-round slots — quarter
    spans are wider per group (~x1.5) and rounds pad across the 4 lane
    quarters; the first frame's measured demand tightens either way."""
    if quarter is None:
        quarter = QUARTER_DEFAULT
    n_tiles = (width // TILE_W) * (height // TILE_H)
    ng = _round_up(tri_capacity, GROUP) // GROUP
    if quarter:
        return _round_up(4 * n_tiles + 6 * ng, 4096)
    return _round_up(n_tiles + 3 * ng, 4096)


def pack_attr_coef(batch: TriangleBatch, coeffs: jax.Array) -> jax.Array:
    """Pack per-triangle raster coefficients + shading attributes into one
    f32[T, 32] row: [0:15]=edge/z/w coefficient rows, [16:25]=vertex normals,
    [25:31]=vertex uvs, [31]=material id. One row gather then serves both the
    kernel (via the pair pre-gather) and the per-pixel G-buffer resolve."""
    t = batch.capacity
    return jnp.concatenate(
        [
            coeffs.reshape(t, 15),
            # col 15 = the triangle's own global id (exact in f32 to 2^24):
            # the kernel one-hot selects it to emit global tids directly
            jnp.arange(t, dtype=jnp.float32)[:, None],
            batch.normal.reshape(t, 9),
            batch.uv.reshape(t, 6),
            batch.material.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )


def _make_kernel(n_tx: int, lane_layout: bool = False, peel: bool = False):
    """Depth-key raster step.

    Default layout: cf block (C, 16) from a [P*GROUP, 16] HBM array, with
    triangles on the SUBLANE axis — fastest measured at normal capacities
    (T(8,128) tiling lane-pads that array 8x, which is acceptable HBM waste
    up to a few GB).

    ``lane_layout``: cf block (1, 16, C) from [n_steps, 16, C] planes with
    triangles on LANES — exact tiling, zero padding. ~10-25% slower per step
    (lane-axis min reduction), used only when the padded default layout
    would not fit HBM (multi-million-pair scenes, BASELINE config 5).

    ``peel``: two extra per-tile i32 inputs (floor/ceil depth keys) window
    the accepted fragments — depth-peeling layers for sorted translucency
    find the nearest fragment strictly inside (floor, ceil).

    The first scalar-prefetch arg is the window origin (x0, y0) in FULL-
    viewport pixels: coefficients stay in full-viewport space (bitwise
    identical edge tests to the single-device run), the kernel offsets its
    pixel coordinates — screen-tile sharding renders a window per device."""
    def kernel(org_ref, wt_ref, cf_ref, *refs):
        if peel:
            floor_ref, ceil_ref, kin_ref, tin_ref, key_ref, tid_ref = refs
        else:
            kin_ref, tin_ref, key_ref, tid_ref = refs
        j = pl.program_id(0)
        t = wt_ref[j]
        prev_t = wt_ref[jnp.maximum(j - 1, 0)]
        first = (j == 0) | (t != prev_t)

        # first touch of a tile: pull carried state from the aliased inputs
        # (pre-initialized to SENTINEL outside — untouched tiles keep it)
        @pl.when(first & (t >= 0))
        def _resume():
            key_ref[:, :] = kin_ref[:, :]
            tid_ref[:, :] = tin_ref[:, :]

        @pl.when(t >= 0)
        def _body():
            ty = t // n_tx
            tx = t % n_tx
            if lane_layout:
                shape = (TILE_H, TILE_W, C)
                y_dim, x_dim, lane_dim = 0, 1, 2
            else:
                shape = (C, TILE_H, TILE_W)
                y_dim, x_dim, lane_dim = 1, 2, 0
            ys = jax.lax.broadcasted_iota(
                jnp.int32, shape, y_dim).astype(jnp.float32)
            xs = jax.lax.broadcasted_iota(
                jnp.int32, shape, x_dim).astype(jnp.float32)
            px = xs + (tx * TILE_W + org_ref[0]).astype(jnp.float32) + 0.5
            py = ys + (ty * TILE_H + org_ref[1]).astype(jnp.float32) + 0.5

            if lane_layout:
                def col(i):
                    return cf_ref[0, i, :].reshape(1, 1, C)
            else:
                def col(i):
                    return cf_ref[:, i:i + 1].reshape(C, 1, 1)

            e0 = col(0) * px + col(1) * py + col(2)
            e1 = col(3) * px + col(4) * py + col(5)
            e2 = col(6) * px + col(7) * py + col(8)
            zn = col(9) * px + col(10) * py + col(11)
            wn = col(12) * px + col(13) * py + col(14)
            # zn >= 0 clips fragments in front of the near plane (Vulkan
            # clip-volume semantics) AND makes accepted depths nonnegative,
            # so their f32 bits sort directly as int32 — no sign-fold ops
            inside = ((e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                      & (wn > 1e-12) & (zn >= 0.0))
            z = zn / jnp.where(inside, wn, 1.0)
            srt = pltpu.bitcast(z, jnp.int32)
            lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, lane_dim)
            accept = inside
            if peel:
                dk = srt & jnp.int32(_KEY_MASK)
                if lane_layout:
                    fl = floor_ref[:, :][:, :, None]
                    ce = ceil_ref[:, :][:, :, None]
                else:
                    fl = floor_ref[:, :][None, :, :]
                    ce = ceil_ref[:, :][None, :, :]
                accept = accept & (dk > fl) & (dk < ce)
            keyv = jnp.where(
                accept,
                (srt & jnp.int32(_KEY_MASK)) | lane,
                jnp.int32(SENTINEL),
            )
            kmin = jnp.min(keyv, axis=lane_dim)           # [H, W] i32

            key_old = key_ref[:, :]
            win = kmin < key_old
            # global tid of the winner: one-hot select of cf col 15 (each
            # row's own global id, f32-exact). Keeps the resolve gather on
            # the compact [T, 32] table — pair-space tables proved
            # gather-hostile (134MB table: ~9 -> ~58 ns/row per pixel).
            if lane_layout:
                onehot = lane == (kmin & jnp.int32(_LANE_MASK))[:, :, None]
            else:
                onehot = lane == (kmin & jnp.int32(_LANE_MASK))[None, :, :]
            gsel = jnp.sum(jnp.where(onehot, col(15), 0.0), axis=lane_dim)
            key_ref[:, :] = jnp.where(win, kmin, key_old)
            tid_ref[:, :] = jnp.where(
                win, gsel.astype(jnp.int32), tid_ref[:, :])

    return kernel


QTILE_W = 32       # quarter width: 4 lane quarters per (8, 128) tile
Q_ROUNDS = 4       # rounds per quarter-kernel step
Q_SLOTS = Q_ROUNDS * 4          # group slots per step (4 quarters x 4 rounds)


def _make_kernel_quarter(n_tx: int, peel: bool = False, crossz: bool = False):
    """Quarter-tile depth-key raster step.

    The classic kernel evaluates each 8-triangle group on the FULL (8, 128)
    tile; at micro-triangle densities (config 5: <1 px mean triangle) >95%
    of that C x P work is waste. Here a step processes Q_SLOTS=16 group
    slots arranged as Q_ROUNDS=4 rounds x 4 lane QUARTERS: in each round,
    every (8, 32) lane quarter evaluates a DIFFERENT group — 4x the useful
    pixel density per vector op.

    Quarter-varying coefficients are produced by ONE MXU matmul per step:
    the (16, 128) slot block (8 tris x 16 coeffs per slot row — the
    pre-gathered ``gt`` rows, no reshape) is contracted against a 0/1
    selector, rep(v, 128r+l) = cf(4r + l//32, v). At Precision.HIGHEST the
    f32 3-way split reconstructs value*1.0 exactly for all NORMAL f32
    (denormal coefficients flush to +-0, which contribute < 1e-35 to an
    edge function and keep e >= 0 seams closed — measured, see PERF.md).
    Coefficient planes then come off the scratch as (1, 128) sublane rows —
    native sublane broadcasts, no lane shuffles.

    Measured 1.34 us/step = 84 ns/quarter-pair vs the classic kernel's
    419 ns/tile-pair (5x/pair; net win depends on quarter-span growth and
    round padding, ~3x at config-5 density).

    ``crossz`` (opaque path only — mutually exclusive with ``peel``): the
    per-candidate ``zn / wn`` divide is the single most expensive vector op
    in the step (PERF.md). Instead of dividing, the running winner is carried
    as the raw ``(zn, wn)`` NUMERATOR/DENOMINATOR pair and candidates compare
    by cross-multiplication: with all accepted zn >= 0 and wn > 0,
    ``zn_c/wn_c < zn_b/wn_b  <=>  zn_c*wn_b < zn_b*wn_c`` — two multiplies
    replace the divide. Depth becomes EXACT (one divide per PIXEL after the
    kernel, not per candidate) and ties break toward the earliest
    (step, round, slot) candidate, deterministically. State planes are
    (zn f32, wn f32, tid i32); "no fragment yet" is (zn=1, wn=0) = +inf."""
    def kernel(org_ref, wt_ref, cft_ref, *refs):
        if peel:
            floor_ref, ceil_ref, kin_ref, tin_ref, key_ref, tid_ref, rep_ref = refs
        elif crossz:
            (zin_ref, win_ref, tin_ref,
             zn_ref, wn_ref, tid_ref, rep_ref) = refs
        else:
            kin_ref, tin_ref, key_ref, tid_ref, rep_ref = refs
        j = pl.program_id(0)
        t = wt_ref[j]
        prev_t = wt_ref[jnp.maximum(j - 1, 0)]
        first = (j == 0) | (t != prev_t)

        @pl.when(first & (t >= 0))
        def _resume():
            if crossz:
                zn_ref[:, :] = zin_ref[:, :]
                wn_ref[:, :] = win_ref[:, :]
            else:
                key_ref[:, :] = kin_ref[:, :]
            tid_ref[:, :] = tin_ref[:, :]

        @pl.when(t >= 0)
        def _body():
            ty = t // n_tx
            tx = t % n_tx
            # replicate all 16 slots' 128 values across their quarters
            srow = jax.lax.broadcasted_iota(
                jnp.int32, (Q_SLOTS, Q_ROUNDS * TILE_W), 0)
            scol = jax.lax.broadcasted_iota(
                jnp.int32, (Q_SLOTS, Q_ROUNDS * TILE_W), 1)
            sel = (srow == 4 * (scol // TILE_W)
                   + (scol % TILE_W) // QTILE_W).astype(jnp.float32)
            rep_ref[:, :] = jax.lax.dot_general(
                cft_ref[:, :], sel, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

            ys = jax.lax.broadcasted_iota(
                jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
            xs = jax.lax.broadcasted_iota(
                jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
            px = xs + (tx * TILE_W + org_ref[0]).astype(jnp.float32) + 0.5
            py = ys + (ty * TILE_H + org_ref[1]).astype(jnp.float32) + 0.5
            if peel:
                fl = floor_ref[:, :]
                ce = ceil_ref[:, :]

            if crossz:
                zb = zn_ref[:, :]
                wb = wn_ref[:, :]
                tid_old = tid_ref[:, :]
                gsel = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                changed = jnp.zeros((TILE_H, TILE_W), bool)
                for r in range(Q_ROUNDS):
                    def col(c, i, _r=r):
                        return rep_ref[
                            c * 16 + i, TILE_W * _r:TILE_W * (_r + 1)
                        ].reshape(1, TILE_W)

                    for c in range(GROUP):
                        e0 = col(c, 0) * px + col(c, 1) * py + col(c, 2)
                        e1 = col(c, 3) * px + col(c, 4) * py + col(c, 5)
                        e2 = col(c, 6) * px + col(c, 7) * py + col(c, 8)
                        zn = col(c, 9) * px + col(c, 10) * py + col(c, 11)
                        wn = col(c, 12) * px + col(c, 13) * py + col(c, 14)
                        accept = ((e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                                  & (wn > 1e-12) & (zn >= 0.0))
                        # nearer <=> zn*wb < zb*wn (all operands >= 0);
                        # the empty state (zb=1, wb=0) loses to any accept
                        win = accept & (zn * wb < zb * wn)
                        zb = jnp.where(win, zn, zb)
                        wb = jnp.where(win, wn, wb)
                        gsel = jnp.where(
                            win, col(c, 15) + jnp.zeros_like(gsel), gsel)
                        changed = changed | win
                zn_ref[:, :] = zb
                wn_ref[:, :] = wb
                tid_ref[:, :] = jnp.where(
                    changed, gsel.astype(jnp.int32), tid_old)
                return

            key_old = key_ref[:, :]
            tid_old = tid_ref[:, :]
            kmin = jnp.full((TILE_H, TILE_W), SENTINEL, jnp.int32)
            gsel = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            for r in range(Q_ROUNDS):
                def col(c, i, _r=r):
                    return rep_ref[
                        c * 16 + i, TILE_W * _r:TILE_W * (_r + 1)
                    ].reshape(1, TILE_W)

                for c in range(GROUP):
                    e0 = col(c, 0) * px + col(c, 1) * py + col(c, 2)
                    e1 = col(c, 3) * px + col(c, 4) * py + col(c, 5)
                    e2 = col(c, 6) * px + col(c, 7) * py + col(c, 8)
                    zn = col(c, 9) * px + col(c, 10) * py + col(c, 11)
                    wn = col(c, 12) * px + col(c, 13) * py + col(c, 14)
                    accept = ((e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                              & (wn > 1e-12) & (zn >= 0.0))
                    z = zn / jnp.where(accept, wn, 1.0)
                    srt = pltpu.bitcast(z, jnp.int32)
                    if peel:
                        dk = srt & jnp.int32(_KEY_MASK)
                        accept = accept & (dk > fl) & (dk < ce)
                    keyv = jnp.where(
                        accept,
                        (srt & jnp.int32(_KEY_MASK)) | (r * GROUP + c),
                        jnp.int32(SENTINEL),
                    )
                    win = keyv < kmin
                    kmin = jnp.where(win, keyv, kmin)
                    gsel = jnp.where(win, col(c, 15) + jnp.zeros_like(gsel),
                                     gsel)
            win = kmin < key_old
            key_ref[:, :] = jnp.where(win, kmin, key_old)
            tid_ref[:, :] = jnp.where(win, gsel.astype(jnp.int32), tid_old)

    return kernel


def depth_to_key(z: jax.Array) -> jax.Array:
    """f32 depth -> masked sortable depth key (the kernel's encoding: depths
    are clipped nonnegative, so the f32 bits sort directly as int32);
    used to chain depth-peeling windows."""
    bits = jax.lax.bitcast_convert_type(z.astype(jnp.float32), jnp.int32)
    return bits & jnp.int32(_KEY_MASK)


def _unpack_depth(key: jax.Array, covered: jax.Array) -> jax.Array:
    """Invert the depth key (lane bits quantized away)."""
    z = jax.lax.bitcast_convert_type(
        key & jnp.int32(_KEY_MASK), jnp.float32)
    return jnp.where(covered, z, jnp.inf)


# test hook: run the kernel in the Pallas interpreter (CPU tests)
INTERPRET = False


def _bin_spans(ok, lo, hi, t, t_pad, ng, width, height, org_f, bw, n_ty):
    """Group screen AABBs -> bin-cell spans (capacity-independent; shared by
    the raster pipeline and the demand probe so both count identically).
    Returns (alive, gx0, gx1, gy0, gy1, count) over GROUP-packed triangles:
    the inclusive bin-column/row span of each 8-triangle group's AABB in a
    (width x height) window at pixel offset ``org_f``, with ``bw``-px-wide
    bin columns, and the group's (span-area) pair count."""
    n_bx = width // bw
    lo_m = jnp.where(ok[:, None], lo, jnp.inf)
    hi_m = jnp.where(ok[:, None], hi, -jnp.inf)
    lo_m = jnp.pad(lo_m, ((0, t_pad - t), (0, 0)), constant_values=jnp.inf)
    hi_m = jnp.pad(hi_m, ((0, t_pad - t), (0, 0)), constant_values=-jnp.inf)
    glo = lo_m.reshape(ng, GROUP, 2).min(axis=1)
    ghi = hi_m.reshape(ng, GROUP, 2).max(axis=1)
    alive = jnp.isfinite(glo[:, 0])
    fglo = jnp.nan_to_num(glo, posinf=0.0) - org_f[None, :]   # window space
    fghi = jnp.nan_to_num(ghi, neginf=0.0) - org_f[None, :]
    # cull groups whose AABB misses this window entirely
    alive &= (fghi[:, 0] >= 0.0) & (fglo[:, 0] <= width) \
        & (fghi[:, 1] >= 0.0) & (fglo[:, 1] <= height)
    gx0 = jnp.clip(jnp.floor(fglo[:, 0] / bw).astype(jnp.int32), 0, n_bx - 1)
    gx1 = jnp.clip(jnp.floor(fghi[:, 0] / bw).astype(jnp.int32), 0, n_bx - 1)
    gy0 = jnp.clip(jnp.floor(fglo[:, 1] / TILE_H).astype(jnp.int32), 0, n_ty - 1)
    gy1 = jnp.clip(jnp.floor(fghi[:, 1] / TILE_H).astype(jnp.int32), 0, n_ty - 1)
    gx1 = jnp.maximum(gx1, gx0)
    gy1 = jnp.maximum(gy1, gy0)
    spanw = gx1 - gx0 + 1
    count = jnp.where(alive, spanw * (gy1 - gy0 + 1), 0)
    return alive, gx0, gx1, gy0, gy1, count


def measure_pair_demand(
    batch: TriangleBatch,
    width: int,
    height: int,
    *,
    quarter: Optional[bool] = None,
    full_width: Optional[int] = None,
    full_height: Optional[int] = None,
    origin=(0, 0),
) -> jax.Array:
    """This frame's pair/slot demand WITHOUT running the raster pipeline.

    The capacity probe (the reference's getBuffersRequirements sizing pass
    before a mesh-group buffer rebuild, IndirectDraw.cpp:44-125): computes
    the same ``required`` scalar rasterize_exact returns, but from a
    corner-scatter difference-array histogram over bin cells — one
    scatter-add + a 2D cumsum, no pair stream, no sort, no kernel. It
    compiles in seconds at any scale, so RenderPass can size its work
    capacity at topology changes without first compiling (and running) a
    full raster program at a guessed capacity; at 100k-instance scale the
    guessed-capacity compile alone took minutes over the remote TPU compile
    service. Unlike the in-pipeline ``required`` (whose per-cell histogram
    only sees pairs that fit the current capacity), this count never
    truncates, so one adoption lands the final capacity."""
    assert width % TILE_W == 0 and height % TILE_H == 0, (
        "probe window must be tile-aligned like rasterize_exact "
        f"({TILE_W}x{TILE_H}); a misaligned window would silently floor the "
        "bin grid and under-count demand")
    if quarter is None:
        quarter = QUARTER_DEFAULT
    fw = full_width or width
    fh = full_height or height
    _coeffs, ok, (lo, hi) = triangle_coefficients(batch, fw, fh)
    t = batch.capacity
    t_pad = _round_up(t, GROUP)
    ng = t_pad // GROUP
    n_tx = width // TILE_W
    n_ty = height // TILE_H
    org_f = jnp.asarray(origin, jnp.float32).reshape(2)
    bw = QTILE_W if quarter else TILE_W
    n_bx = width // bw
    alive, gx0, gx1, gy0, gy1, count = _bin_spans(
        ok, lo, hi, t, t_pad, ng, width, height, org_f, bw, n_ty)
    n_pairs = jnp.sum(count)

    # per-cell counts via the 2D difference array: +1/-1 at the four span
    # corners, then cumsum down rows and across columns. ONE scatter-add
    # (chained computed-index scatters SIGABRT the TPU compiler).
    gw = (n_ty + 1) * (n_bx + 1)
    cy = jnp.concatenate([gy0, gy0, gy1 + 1, gy1 + 1])
    cx = jnp.concatenate([gx0, gx1 + 1, gx0, gx1 + 1])
    sgn = jnp.concatenate([
        jnp.ones((ng,), jnp.int32), jnp.full((ng,), -1, jnp.int32),
        jnp.full((ng,), -1, jnp.int32), jnp.ones((ng,), jnp.int32),
    ])
    idx = jnp.where(jnp.tile(alive, 4), cy * (n_bx + 1) + cx, gw)
    d = jnp.zeros((gw,), jnp.int32).at[idx].add(sgn, mode="drop")
    hist = jnp.cumsum(
        jnp.cumsum(d.reshape(n_ty + 1, n_bx + 1), axis=0), axis=1
    )[:n_ty, :n_bx]

    if quarter:
        nq = TILE_W // QTILE_W
        rounds = hist.reshape(n_ty, n_tx, nq).max(axis=-1)
        steps = -(-rounds // Q_ROUNDS)
        return jnp.maximum(jnp.sum(steps) * Q_SLOTS, n_pairs).astype(jnp.int32)
    padded = _round_up_arr(hist, BP)
    return jnp.maximum(jnp.sum(padded), n_pairs).astype(jnp.int32)


def rasterize_exact(
    batch: TriangleBatch,
    width: int,
    height: int,
    *,
    pair_capacity: Optional[int] = None,
    overflow_cond: bool = True,
    depth_window=None,   # (floor_key i32[H,W], ceil_key i32[H,W]) peel mode
    full_width: Optional[int] = None,
    full_height: Optional[int] = None,
    origin=(0, 0),
    quarter: Optional[bool] = None,
    crossz: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Exact-binned raster. Returns (depth f32[H,W], tid i32[H,W] global
    triangle ids, attr_table f32[T_pad, 32], required i32 scalar).

    ``attr_table`` is the packed per-triangle row table (pack_attr_coef) that
    ``resolve_gbuffer_pairs`` gathers per pixel. ``required`` is the pair-slot
    demand for THIS camera. Overflow contract (the reference's buffer-growth
    contract, PaperRenderer.cpp:208-212, made per-frame-safe): when
    ``required`` exceeds ``pair_capacity``, a ``lax.cond`` branch re-bins and
    re-rasterizes at 4x capacity IN-GRAPH, so no frame ships with dropped
    triangles up to a 4x demand jump in one frame — but ONLY while the pair
    coefficient table is <= 128 MiB (the cf_bytes guard below): past that the
    untaken branch's buffers and compile time are too expensive, so a demand
    spike degrades to one frame of dropped fragments. Callers also grow the
    persistent capacity off the returned scalar so the fallback stops being
    taken (and large-scene spikes are covered from the next frame on).

    Screen-tile sharding: render a (width x height) window of a
    (full_width x full_height) viewport at pixel offset ``origin`` (may be
    traced, e.g. axis_index-derived under shard_map). Coefficients stay in
    full-viewport pixel space, so edge tests are bitwise identical to the
    single-device run; binning and the kernel work in window space.

    ``quarter`` selects the quarter-tile kernel (default QUARTER_DEFAULT):
    groups bin to (8, 32) lane quarters and ``pair_capacity``/``required``
    count (group, quarter)-round SLOTS instead of (group, tile) pairs —
    callers that grow capacity off ``required`` stay correct either way."""
    assert width % TILE_W == 0 and height % TILE_H == 0
    if quarter is None:
        quarter = QUARTER_DEFAULT
    if crossz is None:
        crossz = CROSSZ_DEFAULT
    # crossz: quarter opaque path only (the peel window compares quantized
    # keys, which requires the divided-depth key scheme)
    crossz = bool(crossz and quarter and depth_window is None)
    fw = full_width or width
    fh = full_height or height
    coeffs, ok, (lo, hi) = triangle_coefficients(batch, fw, fh)
    t = batch.capacity
    t_pad = _round_up(t, GROUP)
    ng = t_pad // GROUP
    n_tx = width // TILE_W
    n_ty = height // TILE_H
    n_tiles = n_tx * n_ty
    org = jnp.asarray(origin, jnp.int32).reshape(2)
    org_f = org.astype(jnp.float32)

    p_cap0 = pair_capacity or default_pair_capacity(
        width, height, t, quarter=quarter)
    p_cap0 = _round_up(p_cap0, BP)

    bw = QTILE_W if quarter else TILE_W
    n_bx = width // bw
    alive, gx0, gx1, gy0, gy1, count = _bin_spans(
        ok, lo, hi, t, t_pad, ng, width, height, org_f, bw, n_ty)

    ends = jnp.cumsum(count)
    offsets = ends - count                               # exclusive
    n_pairs = ends[-1]
    spanw = gx1 - gx0 + 1
    info = jnp.stack([offsets, gx0, gy0, spanw], axis=-1)   # i32[NG, 4]

    # --- packed coefficient table (capacity-independent) -------------------
    table = pack_attr_coef(batch, coeffs)
    table = jnp.pad(table, ((0, t_pad - t), (0, 0)))
    if t_pad > t:
        table = table.at[t:, 2].set(-1.0)                    # dead: e0 < 0
    gt = table[:, :16].reshape(ng, GROUP * 16)
    dead = jnp.zeros((1, GROUP * 16), jnp.float32)
    dead = dead.at[0, 2::16].set(-1.0)
    gt = jnp.concatenate([gt, dead], axis=0)                 # [NG+1, 128]

    # SMEM holds the whole scalar-prefetch work list; one page is capped at
    # PAGE_STEPS steps (192 KiB) and large scenes loop pages, with tile state
    # flowing between page invocations through the aliased key/tid buffers
    # (same contract as rasterize_tiles_binned's PAGE loop).
    PAGE_STEPS = 49152

    def run(p_cap: int):
        """Pair expansion + tile sort + kernel at one static capacity."""
        n_steps = p_cap // BP

        # pair expansion: scatter run starts + cummax fill-forward
        write = jnp.where(count > 0, offsets, p_cap)         # drop empties
        start_marks = jnp.full((p_cap,), -1, jnp.int32).at[write].set(
            jnp.arange(ng, dtype=jnp.int32), mode="drop")
        pair_group = jax.lax.cummax(start_marks)
        slot = jnp.arange(p_cap, dtype=jnp.int32)
        pvalid = (slot < n_pairs) & (pair_group >= 0)
        pg = jnp.maximum(pair_group, 0)

        gi = info[pg]                                        # [P, 4]
        within = slot - gi[:, 0]
        by = gi[:, 2] + within // gi[:, 3]
        bx = gi[:, 1] + within % gi[:, 3]

        lane_layout = False
        if quarter:
            # --- quarter layout: cells = (tile, lane-quarter); each tile's
            # 4 quarter lists interleave as rounds of 4 slots, padded to
            # Q_ROUNDS rounds per step, so every step is one whole tile ----
            n_cells = n_tiles * 4
            cell = by * n_bx + bx        # == tile*4 + quarter (n_bx = 4*n_tx)
            keys = jnp.where(pvalid, cell, n_cells)
            vals = jnp.where(pvalid, pg, -1)
            cell_s, group_s = jax.lax.sort((keys, vals), num_keys=1)
            starts = jnp.searchsorted(
                cell_s, jnp.arange(n_cells + 1, dtype=jnp.int32)
            ).astype(jnp.int32)
            hist = (starts[1:] - starts[:-1]).reshape(n_tiles, 4)
            rounds = hist.max(axis=1)                        # [n_tiles]
            steps_t = -(-rounds // Q_ROUNDS)
            step_start = jnp.cumsum(steps_t) - steps_t       # exclusive
            total_steps = step_start[-1] + steps_t[-1]
            required = jnp.maximum(total_steps * Q_SLOTS, n_pairs)

            # destination slot of each sorted pair: rank k within its
            # quarter list -> round k, i.e. step k//4, row 4*(k%4)+quarter.
            # cell_s is SORTED, so per-pair table values come from run
            # structure (flag + cummax fill-forward), NOT per-pair gathers —
            # the two [P]-from-small-table gathers here were ~15 ms of the
            # 25.6 ms post-sort step at config-5 scale (prof_binparts).
            cell_c = jnp.minimum(cell_s, n_cells - 1)
            newcell = jnp.concatenate(
                [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]])
            run_start = jax.lax.cummax(jnp.where(newcell, slot, -1))
            k = slot - run_start                 # == slot - starts[cell_c]
            # per-pair step_start[tile]: scatter each tile's value at the
            # tile's first sorted pair position + cummax fill-forward.
            # Colliding writes (empty tiles share a position) carry EQUAL
            # values: step_start is monotone and the intervening empty
            # tiles contribute 0 steps, so any collision order is correct.
            pos_t = starts[0:n_cells:4]      # == p_cap when past capacity
            ss_marks = jnp.zeros((p_cap,), jnp.int32).at[pos_t].max(
                step_start, mode="drop")     # drop, not clip: see required
            step_start_pe = jax.lax.cummax(ss_marks)
            dst = ((step_start_pe + k // Q_ROUNDS) * Q_SLOTS
                   + 4 * (k % Q_ROUNDS) + cell_c % 4)
            ok_s = (group_s >= 0) & (dst < p_cap)
            write2 = jnp.where(ok_s, dst, p_cap)
            padded_group = jnp.full((p_cap,), -1, jnp.int32).at[write2].set(
                group_s, mode="drop")

            # per-step tile ids: scatter tile index at each tile's first
            # step + cummax fill-forward (step runs ascend with tile id)
            wstep = jnp.where(steps_t > 0, step_start, n_steps)
            marks = jnp.full((n_steps,), -1, jnp.int32).at[wstep].set(
                jnp.arange(n_tiles, dtype=jnp.int32), mode="drop")
            wt = jax.lax.cummax(marks)
            wt = jnp.where(
                jnp.arange(n_steps, dtype=jnp.int32)
                < jnp.minimum(total_steps, n_steps), wt, -1)

            pg2 = jnp.where(padded_group >= 0, padded_group, ng)
            cf_pairs = gt[pg2]          # [P, 128] — exact T(8,128) tiling
        else:
            tile = by * n_tx + bx

            # tile-sort + per-tile padding to BP
            keys = jnp.where(pvalid, tile, n_tiles)
            vals = jnp.where(pvalid, pg, -1)
            tile_s, group_s = jax.lax.sort((keys, vals), num_keys=1)
            starts = jnp.searchsorted(
                tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32)
            ).astype(jnp.int32)
            hist = starts[1:] - starts[:-1]                  # [n_tiles]
            padded_hist = _round_up_arr(hist, BP)
            padded_starts = jnp.cumsum(padded_hist) - padded_hist
            # true demand: padded demand of surviving pairs, and the raw pair
            # count when the expansion itself overflowed p_cap
            required = jnp.maximum(
                padded_starts[-1] + padded_hist[-1], n_pairs)

            tbl = jnp.stack([starts[:-1], padded_starts], axis=-1)
            per = tbl[jnp.minimum(tile_s, n_tiles - 1)]
            rank = slot - per[:, 0]
            ppos = per[:, 1] + rank
            ok_s = group_s >= 0
            write2 = jnp.where(ok_s, ppos, p_cap)
            rows = jnp.stack([group_s, tile_s], axis=-1)     # [P, 2]
            padded = jnp.full((p_cap, 2), -1, jnp.int32).at[write2].set(
                rows, mode="drop")
            padded_group = padded[:, 0]
            # padding slots inside a tile's rounded region must map to that
            # tile so the step's output block is right; recover by
            # fill-forward of tile ids (regions contiguous and ascending)
            padded_tile = jax.lax.cummax(padded[:, 1])
            padded_tile = jnp.where(slot < jnp.minimum(required, p_cap),
                                    padded_tile, -1)
            wt = padded_tile[::BP]                           # [n_steps]

            # pre-gather pair coefficient rows (ONE row gather). The fast
            # sublane layout's [P*GROUP, 16] array is lane-padded 8x by
            # T(8,128) tiling; switch to exact-tiling lane planes only when
            # that padding would blow HBM (the padded table + its [P, 128]
            # gather source must both fit: ~6 GiB keeps config-5's
            # ~790k-pair capacity on the fast layout inside a 16 GiB chip
            # with the 1.8 GiB attr table resident).
            lane_layout = p_cap * GROUP * 128 * 4 > (6 << 30)
            pg2 = jnp.where(padded_group >= 0, padded_group, ng)
            gathered = gt[pg2]                               # [P, 128]
            if lane_layout:
                # strided per-plane slices — a reshape/transpose through a
                # 4D view with 8/16-wide minor dims materializes
                # T(8,128)-padded intermediates (8-16x memory), OOMs here
                cf_pairs = jnp.stack(
                    [gathered[:, i::16].reshape(n_steps, C)
                     for i in range(16)],
                    axis=1,
                )                                            # [n_steps, 16, C]
            else:
                cf_pairs = gathered.reshape(p_cap * GROUP, 16)

        # pages split the steps EVENLY (not padded to PAGE_STEPS): a demand
        # one step past the page cap would otherwise pay a near-empty second
        # page of ~49k no-op grid steps (~0.7 us each = ~33 ms)
        n_pages = max(1, -(-n_steps // PAGE_STEPS))
        page_steps = -(-n_steps // n_pages)
        if n_pages > 1:
            pad_steps = n_pages * page_steps - n_steps
            wt = jnp.pad(wt, (0, pad_steps), constant_values=-1)
            if quarter:
                cf_pairs = jnp.pad(
                    cf_pairs, ((0, pad_steps * Q_SLOTS), (0, 0)))
            elif lane_layout:
                cf_pairs = jnp.pad(
                    cf_pairs, ((0, pad_steps), (0, 0), (0, 0)))
            else:
                cf_pairs = jnp.pad(cf_pairs, ((0, pad_steps * C), (0, 0)))

        tile_spec = pl.BlockSpec(
            (TILE_H, TILE_W),
            lambda j, org, wt: (jnp.maximum(wt[j], 0) // n_tx,
                                jnp.maximum(wt[j], 0) % n_tx),
            memory_space=pltpu.VMEM,
        )
        scratch_shapes = ()
        if quarter:
            cf_spec = pl.BlockSpec((Q_SLOTS, 128),
                                   lambda j, org, wt: (j, 0),
                                   memory_space=pltpu.VMEM)
            cf_rows = page_steps * Q_SLOTS
            scratch_shapes = (pltpu.VMEM(
                (GROUP * 16, Q_ROUNDS * TILE_W), jnp.float32),)
        elif lane_layout:
            cf_spec = pl.BlockSpec((1, 16, C), lambda j, org, wt: (j, 0, 0),
                                   memory_space=pltpu.VMEM)
            cf_rows = page_steps
        else:
            cf_spec = pl.BlockSpec((C, 16), lambda j, org, wt: (j, 0),
                                   memory_space=pltpu.VMEM)
            cf_rows = page_steps * C
        peel = depth_window is not None
        n_planes = 3 if crossz else 2
        window_specs = [tile_spec, tile_spec] if peel else []
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(page_steps,),
            in_specs=[cf_spec] + window_specs + [tile_spec] * n_planes,
            out_specs=[tile_spec] * n_planes,
            scratch_shapes=scratch_shapes,
        )
        if crossz:
            # (zn, wn, tid): "no fragment" = (1, 0) -> zn/wn = +inf
            state = (
                jnp.ones((height, width), jnp.float32),
                jnp.zeros((height, width), jnp.float32),
                jnp.full((height, width), SENTINEL, jnp.int32),
            )
            out_shape = [
                jax.ShapeDtypeStruct((height, width), jnp.float32),
                jax.ShapeDtypeStruct((height, width), jnp.float32),
                jax.ShapeDtypeStruct((height, width), jnp.int32),
            ]
        else:
            state = (
                jnp.full((height, width), SENTINEL, jnp.int32),
                jnp.full((height, width), SENTINEL, jnp.int32),
            )
            out_shape = [
                jax.ShapeDtypeStruct((height, width), jnp.int32),
                jax.ShapeDtypeStruct((height, width), jnp.int32),
            ]
        wt2, cf2 = jax.lax.optimization_barrier((wt, cf_pairs))
        # aliased state planes follow org, wt, cf (+ optional window planes)
        alias_base = 5 if peel else 3
        for page in range(n_pages):
            wt_p = jax.lax.slice_in_dim(
                wt2, page * page_steps, (page + 1) * page_steps)
            cf_p = jax.lax.slice_in_dim(
                cf2, page * cf_rows, (page + 1) * cf_rows)
            args = [org, wt_p, cf_p]
            if peel:
                args += [depth_window[0], depth_window[1]]
            args += list(state)
            kern = (_make_kernel_quarter(n_tx, peel, crossz) if quarter
                    else _make_kernel(n_tx, lane_layout, peel))
            state = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=out_shape,
                input_output_aliases={
                    alias_base + i: i for i in range(n_planes)},
                interpret=INTERPRET,
            )(*args)
        return tuple(state) + (required,)

    *state, required = run(p_cap0)
    state = tuple(state)
    # XLA allocates BOTH lax.cond branches, so the in-graph 4x fallback is
    # only carried while its buffers are cheap; at multi-hundred-MB scale
    # the fallback branch both bloats compile time (a second full pipeline
    # at 4x capacity — the remote TPU compile at 100k-instance scale is
    # minutes) and squeezes HBM, so the per-frame guard degrades to the
    # host-side persistent growth off ``required`` (one frame may drop
    # fragments on a >capacity demand spike; pinned by tests/test_overflow).
    cf_bytes = p_cap0 * 128 * 4 * (1 if quarter else GROUP)
    if overflow_cond and cf_bytes <= (1 << 27):
        state = jax.lax.cond(
            required > p_cap0,
            lambda _: run(_round_up(4 * p_cap0, BP))[:-1],
            lambda _: state,
            operand=None,
        )

    if crossz:
        zn, wn, tid = state
        covered = tid != SENTINEL
        # exact depth: ONE divide per pixel (the kernel never divides)
        depth = jnp.where(covered, zn / jnp.maximum(wn, 1e-30), jnp.inf)
    else:
        key, tid = state
        covered = tid != SENTINEL
        depth = _unpack_depth(key, covered)
    tid_i = jnp.where(covered, tid, -1)
    return depth, tid_i, table, required


def _round_up_arr(x: jax.Array, m: int) -> jax.Array:
    return -(-x // m) * m


def resolve_gbuffer_pairs(
    attr_pairs: jax.Array,     # f32[T_pad, 32] attr table from rasterize_exact
    depth: jax.Array,
    tri_id: jax.Array,         # global triangle ids
    camera,
    *,
    full_width: int | None = None,
    full_height: int | None = None,
    origin=(0, 0),
):
    """G-buffer resolve for pair-space raster output: one packed row gather
    per pixel; barycentrics recomputed from the row's coefficient part and
    world position by unprojecting (pixel, depth) — see
    raster.resolve_gbuffer_packed for the unprojection rationale."""
    from .raster import GBuffer

    h, w = depth.shape
    fw = full_width or w
    fh = full_height or h
    x0, y0 = origin
    # All intermediate math runs FLAT over P = H*W pixels: a gather indexed
    # by a [H, W] array produces a [H, W, 128] result that XLA materializes
    # in planar layout and then relayout-copies for the downstream slices
    # (~0.4 ms relayout + unfused selects at 512^2, measured round 4); the
    # [P, 128] result is already exact (8,128) tiling and fuses.
    covered = (tri_id >= 0).reshape(-1)
    tid = jnp.maximum(tri_id, 0).reshape(-1)

    tp = attr_pairs.shape[0]
    if tp % 4 == 0 and tp >= 16384:
        # Gather 4 triangle rows per physical lane row: the [T, 32] f32
        # table is lane-padded 32->128 by T(8,128) tiling, so a per-pixel
        # row gather DMAs 512 bytes with 3/4 waste; the [T/4, 128] view is
        # exactly one packed lane row (4x less HBM traffic on the resolve
        # gather — the per-pixel gather is the G-buffer resolve bottleneck).
        # Only past ~16k rows though: a SMALL table is cache/VMEM-hot, the
        # gather is bound by its RESULT bandwidth instead of the row fetches,
        # and the [P, 128] packed result (+ the relayout copy XLA inserts
        # for the column-sliced consumers) costs ~1 ms of a 2 ms 512^2 frame
        # (measured round 4); the narrow [P, 32] result is 4x less traffic.
        t4 = attr_pairs.reshape(tp // 4, 128)
        rows4 = t4[tid >> 2]                              # [P, 128]
        sub = tid & 3
        rows = rows4[:, 0:32]
        for k in (1, 2, 3):
            rows = jnp.where(
                (sub == k)[:, None], rows4[:, 32 * k:32 * (k + 1)], rows)
    else:
        rows = attr_pairs[tid]                            # [P, 32]

    xs = jnp.arange(w, dtype=jnp.float32) + 0.5 + x0
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5 + y0
    px = jnp.broadcast_to(xs[None, :], (h, w)).reshape(-1)
    py = jnp.broadcast_to(ys[:, None], (h, w)).reshape(-1)
    e0 = rows[:, 0] * px + rows[:, 1] * py + rows[:, 2]
    e1 = rows[:, 3] * px + rows[:, 4] * py + rows[:, 5]
    e2 = rows[:, 6] * px + rows[:, 7] * py + rows[:, 8]
    esum = jnp.maximum(e0 + e1 + e2, 1e-30)
    b1 = e1 / esum
    b2 = e2 / esum
    b0 = 1.0 - b1 - b2

    inv_vp = jnp.linalg.inv(camera.view_proj)
    ndc_x = px / fw * 2.0 - 1.0
    ndc_y = 1.0 - py / fh * 2.0
    z = jnp.where(covered, depth.reshape(-1), 0.0)
    cols = [
        inv_vp[i, 0] * ndc_x + inv_vp[i, 1] * ndc_y + inv_vp[i, 2] * z + inv_vp[i, 3]
        for i in range(4)
    ]
    inv_w = 1.0 / jnp.where(jnp.abs(cols[3]) < 1e-12, 1e-12, cols[3])
    world = jnp.stack([cols[0] * inv_w, cols[1] * inv_w, cols[2] * inv_w], axis=-1)

    n = (
        b0[:, None] * rows[:, 16:19]
        + b1[:, None] * rows[:, 19:22]
        + b2[:, None] * rows[:, 22:25]
    )
    normal = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    uv = (
        b0[:, None] * rows[:, 25:27]
        + b1[:, None] * rows[:, 27:29]
        + b2[:, None] * rows[:, 29:31]
    )
    material = jnp.where(covered, rows[:, 31].astype(jnp.int32), 0)
    cov3 = covered[:, None]
    return GBuffer(
        depth=depth,
        tri_id=tri_id,
        world_pos=jnp.where(cov3, world, 0.0).reshape(h, w, 3),
        normal=jnp.where(cov3, normal, 0.0).reshape(h, w, 3),
        uv=jnp.where(cov3, uv, 0.0).reshape(h, w, 2),
        material=material.reshape(h, w),
    )
