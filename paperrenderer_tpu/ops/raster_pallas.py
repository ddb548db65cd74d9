"""Pallas TPU tile rasterizer.

Same contract as ops.raster.rasterize (nearest covering triangle per pixel)
but executed as a Pallas kernel tuned for the TPU memory hierarchy:

  * grid = (tile_y, tile_x, chunk) with the chunk axis innermost — on TPU the
    grid is executed sequentially, so per-tile best-hit state lives in VMEM
    scratch across chunk steps (the matmul-accumulator pattern);
  * coefficients are stored coefficient-major f32[16, T] so triangle chunks
    are lane-aligned (last dim 128-multiples) and stream HBM->VMEM via
    BlockSpec double buffering;
  * binning: triangles are pre-sorted by screen-space morton code (in JAX) so
    a chunk's screen footprint is tight; a precomputed (tile, chunk) overlap
    mask gates the whole chunk body with @pl.when — empty chunks cost only
    their (tiny) DMA;
  * the inner evaluation is broadcast FMA on the VPU: [P, 1] x [1, C] pixel
    coords against coefficient rows, never a GEMM (precision — see
    ops.raster.triangle_coefficients).

This replaces the hardware rasterizer + ROP the reference gets from Vulkan
(vkCmdDrawIndexedIndirect consuming the GPU-built draw list).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import TriangleBatch, triangle_coefficients
from .bvh import morton_codes

# Tile shape 8x128 (the native f32 VPU tile): P=1024 pixels flattened to
# sublanes; [P, C] work arrays are (1024, 128) f32 = 512 KiB, ~6 live temps
# ≈ 3 MiB VMEM. Output blocks are exactly (8, 128)-aligned as Mosaic requires.
TILE_H = 8
TILE_W = 128
CHUNK = 128      # streaming chunk for rasterize_tiles
CHUNK_B = 128    # binned-path chunk (measured best: per-item overhead
                 # dominates below this; see docs/PERF.md)


def _kernel(aabb_ref, coef_ref, depth_ref, tid_ref, bary_ref, state_ref):
    # aabb_ref is a scalar-prefetch arg: per-chunk screen AABBs [K, 4]
    # (lo_x, lo_y, hi_x, hi_y) in SMEM — 16 bytes per chunk regardless of the
    # tile count, tested against this tile's rect to skip empty chunks.
    # coef_ref streams per-chunk coefficient blocks [16, C] into SMEM
    # (scalars feed the VPU broadcast). Pixels stay in the native
    # (TILE_H, TILE_W)=(8,128) register tile; the chunk's triangles run in a
    # scalar loop of broadcast FMAs over the tile.
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    k = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    tile = (TILE_H, TILE_W)

    @pl.when(k == 0)
    def _init():
        state_ref[0] = jnp.full(tile, jnp.inf, jnp.float32)
        state_ref[1] = jnp.full(tile, -1.0, jnp.float32)
        state_ref[2] = jnp.zeros(tile, jnp.float32)
        state_ref[3] = jnp.zeros(tile, jnp.float32)

    tile_x0 = (tx * TILE_W).astype(jnp.float32)
    tile_y0 = (ty * TILE_H).astype(jnp.float32)
    overlap = (
        (aabb_ref[k, 0] <= tile_x0 + TILE_W)
        & (aabb_ref[k, 2] >= tile_x0)
        & (aabb_ref[k, 1] <= tile_y0 + TILE_H)
        & (aabb_ref[k, 3] >= tile_y0)
    )

    @pl.when(overlap)
    def _body():
        ys = jax.lax.broadcasted_iota(jnp.int32, tile, 0).astype(jnp.float32)
        xs = jax.lax.broadcasted_iota(jnp.int32, tile, 1).astype(jnp.float32)
        px = xs + (tx * TILE_W).astype(jnp.float32) + 0.5
        py = ys + (ty * TILE_H).astype(jnp.float32) + 0.5

        def tri_body(c, state):
            depth, tid, b1s, b2s = state
            e0 = px * coef_ref[0, c] + py * coef_ref[1, c] + coef_ref[2, c]
            e1 = px * coef_ref[3, c] + py * coef_ref[4, c] + coef_ref[5, c]
            e2 = px * coef_ref[6, c] + py * coef_ref[7, c] + coef_ref[8, c]
            zn = px * coef_ref[9, c] + py * coef_ref[10, c] + coef_ref[11, c]
            wn = px * coef_ref[12, c] + py * coef_ref[13, c] + coef_ref[14, c]
            inside = ((e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                      & (wn > 1e-12) & (zn >= 0.0))
            z = zn / jnp.where(inside, wn, 1.0)
            win = inside & (z < depth)
            esum = jnp.maximum(e0 + e1 + e2, 1e-30)
            tid_new = (k * CHUNK + c).astype(jnp.float32)
            return (
                jnp.where(win, z, depth),
                jnp.where(win, tid_new, tid),
                jnp.where(win, e1 / esum, b1s),
                jnp.where(win, e2 / esum, b2s),
            )

        state = (state_ref[0], state_ref[1], state_ref[2], state_ref[3])
        depth, tid, b1s, b2s = jax.lax.fori_loop(0, CHUNK, tri_body, state)
        state_ref[0] = depth
        state_ref[1] = tid
        state_ref[2] = b1s
        state_ref[3] = b2s

    @pl.when(k == n_chunks - 1)
    def _emit():
        depth_ref[:, :] = state_ref[0]
        tid_ref[:, :] = state_ref[1].astype(jnp.int32)
        bary_ref[:, :, 0] = state_ref[2]
        bary_ref[:, :, 1] = state_ref[3]


def _sort_by_screen_morton(coeffs, aabb_lo, aabb_hi, ok, width, height):
    """Sort triangles by morton code of their screen AABB center so chunks
    have tight screen footprints. Returns (coeffs_sorted, perm, lo, hi)."""
    center = (aabb_lo + aabb_hi) * 0.5
    c3 = jnp.concatenate([center, jnp.zeros_like(center[:, :1])], axis=-1)
    lo = jnp.asarray([0.0, 0.0, 0.0])
    hi = jnp.asarray([float(width), float(height), 1.0])
    codes = morton_codes(c3[:, :3], lo, hi)
    codes = jnp.where(ok, codes, jnp.uint32(0xFFFFFFFF))  # dead tris last
    perm = jnp.argsort(codes).astype(jnp.int32)
    return coeffs[perm], perm, aabb_lo[perm], aabb_hi[perm]


def rasterize_tiles(
    batch: TriangleBatch,
    width: int,
    height: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pallas tile rasterizer; same returns as ops.raster.rasterize."""
    assert width % TILE_W == 0 and height % TILE_H == 0, (
        f"image must be a multiple of {TILE_W}x{TILE_H}"
    )
    coeffs, ok, (lo, hi) = triangle_coefficients(batch, width, height)
    t = batch.capacity
    n_chunks = pl.cdiv(t, CHUNK)
    t_pad = n_chunks * CHUNK

    coeffs, perm, lo, hi = _sort_by_screen_morton(coeffs, lo, hi, ok, width, height)
    ok_sorted = ok[perm]

    # coefficient-major layout [16, T_pad] (row 15 = padding for tiling)
    cf = jnp.pad(
        coeffs.reshape(t, 15).T,
        ((0, 1), (0, t_pad - t)),
        constant_values=0.0,
    )
    if t_pad > t:
        # padded triangles never cover: e0 constant -1
        cf = cf.at[2, t:].set(-1.0)

    n_ty = height // TILE_H
    n_tx = width // TILE_W

    # (tile, chunk) overlap mask from sorted screen AABBs (JAX-side binning)
    chunk_lo = jnp.where(ok_sorted[:, None], lo, jnp.inf)
    chunk_hi = jnp.where(ok_sorted[:, None], hi, -jnp.inf)
    chunk_lo = jnp.pad(chunk_lo, ((0, t_pad - t), (0, 0)), constant_values=jnp.inf)
    chunk_hi = jnp.pad(chunk_hi, ((0, t_pad - t), (0, 0)), constant_values=-jnp.inf)
    cl = chunk_lo.reshape(n_chunks, CHUNK, 2).min(axis=1)   # [K, 2]
    ch = chunk_hi.reshape(n_chunks, CHUNK, 2).max(axis=1)
    # per-chunk screen AABBs (lo_x, lo_y, hi_x, hi_y); empty chunks get an
    # inverted box that overlaps nothing
    chunk_aabb = jnp.concatenate(
        [jnp.nan_to_num(cl, posinf=1e9), jnp.nan_to_num(ch, neginf=-1e9)], axis=-1
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ty, n_tx, n_chunks),
        in_specs=[
            pl.BlockSpec((16, CHUNK), lambda ty, tx, k, mask: (0, k),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, k, mask: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, k, mask: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W, 2), lambda ty, tx, k, mask: (ty, tx, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, TILE_H, TILE_W), jnp.float32),
        ],
    )
    depth, tid, bary = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.float32),
            jax.ShapeDtypeStruct((height, width), jnp.int32),
            jax.ShapeDtypeStruct((height, width, 2), jnp.float32),
        ],
    )(chunk_aabb, cf)

    # map sorted ids back to original batch ids
    miss = tid < 0
    tid = jnp.where(miss, 0, tid)
    tid = jnp.where(miss, -1, perm[jnp.minimum(tid, t - 1)])
    return depth, tid, bary


# ---------------------------------------------------------------------------
# Work-queue variant: grid over compacted (tile, chunk) pairs.
# ---------------------------------------------------------------------------

def _make_wq_kernel(n_tx: int):
    # wt/wc are scalar-prefetch work lists: work item j = (tile wt[j],
    # chunk wc[j]); wc = -1 marks a seed (init-only) entry. Items are sorted
    # by tile, so output blocks are revisited consecutively and Pallas keeps
    # them resident in VMEM — they ARE the accumulator state. Coefficients
    # arrive triangle-major [CHUNK_B, 16] in SMEM.
    #
    # The work list is processed in PAGES (SMEM holds one page of wt/wc);
    # state flows between page invocations through the aliased output buffers
    # plus an explicit first-touch copy from the state input refs.
    def kernel(wt_ref, wc_ref, coef_ref, din_ref, tin_ref, bin_ref,
               depth_ref, tid_ref, bary_ref):
        j = pl.program_id(0)
        t = wt_ref[j]
        k = wc_ref[j]
        tile = (TILE_H, TILE_W)
        prev_t = wt_ref[jnp.maximum(j - 1, 0)]
        first_touch = (j == 0) | (t != prev_t)

        # wc == -1: seed (init) entry; wc >= 0: chunk work; wc == -2: padding
        @pl.when(k == -1)
        def _init():
            depth_ref[:, :] = jnp.full(tile, jnp.inf, jnp.float32)
            tid_ref[:, :] = jnp.full(tile, -1.0, jnp.float32)
            bary_ref[:, :, 0] = jnp.zeros(tile, jnp.float32)
            bary_ref[:, :, 1] = jnp.zeros(tile, jnp.float32)

        @pl.when(first_touch & (k >= 0))
        def _resume():
            # tile state carried over from a previous page
            depth_ref[:, :] = din_ref[:, :]
            tid_ref[:, :] = tin_ref[:, :]
            bary_ref[:, :, :] = bin_ref[:, :, :]

        @pl.when(k >= 0)
        def _body():
            # Fully vectorized over the chunk: coefficients as [C,1,1]
            # columns broadcast against the [1,H,W] pixel grid — no scalar
            # loads, no triangle loop (the scalar-load-bound fori_loop was
            # ~6.5us/item; this is pure VPU work).
            ty = t // n_tx
            tx = t % n_tx
            ys3 = jax.lax.broadcasted_iota(
                jnp.int32, (1, TILE_H, TILE_W), 1
            ).astype(jnp.float32)
            xs3 = jax.lax.broadcasted_iota(
                jnp.int32, (1, TILE_H, TILE_W), 2
            ).astype(jnp.float32)
            px = xs3 + (tx * TILE_W).astype(jnp.float32) + 0.5
            py = ys3 + (ty * TILE_H).astype(jnp.float32) + 0.5

            def col(i):
                return coef_ref[:, i:i + 1].reshape(CHUNK_B, 1, 1)

            e0 = col(0) * px + col(1) * py + col(2)     # [C, H, W]
            e1 = col(3) * px + col(4) * py + col(5)
            e2 = col(6) * px + col(7) * py + col(8)
            zn = col(9) * px + col(10) * py + col(11)
            wn = col(12) * px + col(13) * py + col(14)
            inside = ((e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                      & (wn > 1e-12) & (zn >= 0.0))
            z = jnp.where(inside, zn / jnp.where(inside, wn, 1.0), jnp.inf)

            best_c = jnp.argmin(z, axis=0)               # [H, W]
            best_z = jnp.min(z, axis=0)
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
                == best_c[None, :, :]
            )
            b0 = jnp.sum(jnp.where(onehot, e0, 0.0), axis=0)
            b1 = jnp.sum(jnp.where(onehot, e1, 0.0), axis=0)
            b2 = jnp.sum(jnp.where(onehot, e2, 0.0), axis=0)
            esum = jnp.maximum(b0 + b1 + b2, 1e-30)

            depth = depth_ref[:, :]
            win = best_z < depth
            tid_new = (k * CHUNK_B + best_c).astype(jnp.float32)
            depth_ref[:, :] = jnp.where(win, best_z, depth)
            tid_ref[:, :] = jnp.where(win, tid_new, tid_ref[:, :])
            bary_ref[:, :, 0] = jnp.where(win, b1 / esum, bary_ref[:, :, 0])
            bary_ref[:, :, 1] = jnp.where(win, b2 / esum, bary_ref[:, :, 1])

    return kernel


def rasterize_tiles_binned(
    batch: TriangleBatch,
    width: int,
    height: int,
    *,
    work_capacity: Optional[int] = None,
    presorted: bool = False,
):
    """Work-queue Pallas rasterizer.

    Instead of visiting every (tile, chunk) pair like ``rasterize_tiles``,
    build (in JAX, on device) a compacted work list of pairs whose screen
    AABBs overlap, seeded with one init entry per tile, sorted by tile. The
    Pallas grid walks only that list — empty screen regions cost one init
    step per tile. Returns (depth, tid, bary, required_work) where
    ``required_work`` (device scalar) must be <= work_capacity for a complete
    image; callers treat it like the reference's buffer-growth overflow
    (check occasionally, bump capacity + recompile).

    ``presorted``: the batch is already spatially coherent (e.g. static
    mappings built with spatial_sort) — skip the per-frame screen-morton
    sort, saving an argsort + full coefficient shuffle per frame.
    """
    assert width % TILE_W == 0 and height % TILE_H == 0
    coeffs, ok, (lo, hi) = triangle_coefficients(batch, width, height)
    t = batch.capacity
    n_chunks = pl.cdiv(t, CHUNK_B)
    t_pad = n_chunks * CHUNK_B

    if presorted:
        perm = None
        ok_sorted = ok
    else:
        coeffs, perm, lo, hi = _sort_by_screen_morton(coeffs, lo, hi, ok, width, height)
        ok_sorted = ok[perm]

    # triangle-major [T_pad, 16] (col 15 = padding); dead rows never cover
    cf = jnp.pad(
        coeffs.reshape(t, 15), ((0, t_pad - t), (0, 1)), constant_values=0.0
    )
    if t_pad > t:
        cf = cf.at[t:, 2].set(-1.0)

    n_ty = height // TILE_H
    n_tx = width // TILE_W
    n_tiles = n_ty * n_tx

    chunk_lo = jnp.where(ok_sorted[:, None], lo, jnp.inf)
    chunk_hi = jnp.where(ok_sorted[:, None], hi, -jnp.inf)
    chunk_lo = jnp.pad(chunk_lo, ((0, t_pad - t), (0, 0)), constant_values=jnp.inf)
    chunk_hi = jnp.pad(chunk_hi, ((0, t_pad - t), (0, 0)), constant_values=-jnp.inf)
    cl = chunk_lo.reshape(n_chunks, CHUNK_B, 2).min(axis=1)
    ch = chunk_hi.reshape(n_chunks, CHUNK_B, 2).max(axis=1)

    # tile rect grid
    ty_idx = jnp.arange(n_tiles, dtype=jnp.int32) // n_tx
    tx_idx = jnp.arange(n_tiles, dtype=jnp.int32) % n_tx
    tx0 = tx_idx.astype(jnp.float32) * TILE_W
    ty0 = ty_idx.astype(jnp.float32) * TILE_H
    ovl = (
        (cl[None, :, 0] <= tx0[:, None] + TILE_W)
        & (ch[None, :, 0] >= tx0[:, None])
        & (cl[None, :, 1] <= ty0[:, None] + TILE_H)
        & (ch[None, :, 1] >= ty0[:, None])
    )  # [n_tiles, K]

    # work list layout: [all n_tiles seed entries (chunk=-1)] then the
    # overlapping (tile, chunk) pairs sorted by tile; padding entries use
    # chunk=-2 (no-op). Overflow therefore only ever drops *pair* work —
    # every tile is always initialized (graceful degradation, mirrored by
    # the required_work growth contract).
    flat = ovl.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    required = n_tiles + pos[-1] + 1

    # Page the work list: SMEM holds only one page of (wt, wc) at a time
    # (the full list for large scenes exceeds the ~1 MiB SMEM budget).
    PAGE = 12288
    w_cap = max(work_capacity or (n_tiles + 8 * n_chunks), n_tiles + 1)
    n_pages = -(-w_cap // PAGE)
    w_pad = n_pages * PAGE

    tile_of = jnp.broadcast_to(
        jnp.arange(n_tiles, dtype=jnp.int32)[:, None], (n_tiles, n_chunks)
    ).reshape(-1)
    chunk_of = jnp.broadcast_to(
        jnp.arange(n_chunks, dtype=jnp.int32)[None, :], (n_tiles, n_chunks)
    ).reshape(-1)
    write = jnp.where(flat, n_tiles + pos, w_pad)  # OOB dropped
    # seed entries come from an iota-select init (not a second scatter —
    # chained scatters with computed indices SIGABRT the XLA:TPU compiler
    # on libtpu 0.0.34)
    slot = jnp.arange(w_pad, dtype=jnp.int32)
    seed_init_tile = jnp.where(slot < n_tiles, slot, n_tiles - 1)
    seed_init_chunk = jnp.where(slot < n_tiles, -1, -2)
    work_tile = seed_init_tile.at[write].set(tile_of, mode="drop")
    work_chunk = seed_init_chunk.at[write].set(chunk_of, mode="drop")

    tile_spec2 = pl.BlockSpec(
        (TILE_H, TILE_W),
        lambda j, wt, wc: (wt[j] // n_tx, wt[j] % n_tx),
        memory_space=pltpu.VMEM,
    )
    tile_spec3 = pl.BlockSpec(
        (TILE_H, TILE_W, 2),
        lambda j, wt, wc: (wt[j] // n_tx, wt[j] % n_tx, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(PAGE,),
        in_specs=[
            pl.BlockSpec(
                (CHUNK_B, 16),
                lambda j, wt, wc: (jnp.maximum(wc[j], 0), 0),
                memory_space=pltpu.VMEM,
            ),
            tile_spec2, tile_spec2, tile_spec3,
        ],
        out_specs=[tile_spec2, tile_spec2, tile_spec3],
    )
    # optimization_barrier: without it, XLA:TPU's fusion of the work-list
    # scatters into the pallas_call operands SIGABRTs the compiler
    # (observed on libtpu 0.0.34; op-by-op execution of the same graph works)
    work_tile, work_chunk, cf = jax.lax.optimization_barrier(
        (work_tile, work_chunk, cf)
    )
    depth = jnp.zeros((height, width), jnp.float32)
    tidf = jnp.zeros((height, width), jnp.float32)
    bary = jnp.zeros((height, width, 2), jnp.float32)
    kernel = _make_wq_kernel(n_tx)
    for page in range(n_pages):
        wt_p = jax.lax.slice_in_dim(work_tile, page * PAGE, (page + 1) * PAGE)
        wc_p = jax.lax.slice_in_dim(work_chunk, page * PAGE, (page + 1) * PAGE)
        depth, tidf, bary = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((height, width), jnp.float32),
                jax.ShapeDtypeStruct((height, width), jnp.float32),
                jax.ShapeDtypeStruct((height, width, 2), jnp.float32),
            ],
            # alias state inputs onto outputs so tiles untouched by this
            # page keep their previous contents (indices count the scalar-
            # prefetch args: wt=0 wc=1 cf=2, then state 3,4,5)
            input_output_aliases={3: 0, 4: 1, 5: 2},
        )(wt_p, wc_p, cf, depth, tidf, bary)

    tid = tidf.astype(jnp.int32)
    miss = tid < 0
    if perm is not None:
        tid = jnp.where(miss, 0, tid)
        tid = jnp.where(miss, -1, perm[jnp.minimum(tid, t - 1)])
    else:
        tid = jnp.where(miss, -1, jnp.minimum(tid, t - 1))
    return depth, tid, bary, required
