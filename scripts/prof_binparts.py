"""Time the pieces of rasterize_exact's quarter binning at config-5 scale.

The config-5 stage profile attributes ~160 ms to "raster minus kernel wall"
(sort + scatters + the [P, 128] coefficient gather). This isolates each
piece with the REAL pair stream so the next optimization targets the
measured line, not a guess.

Usage: python scripts/prof_binparts.py [--n 100000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, args, iters=10, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100000)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

    from examples.render_dynamic import build_dynamic_scene
    from paperrenderer_tpu.ops import raster_exact as RX
    from paperrenderer_tpu.ops.raster import triangle_coefficients
    from paperrenderer_tpu.ops.raster_exact import (
        GROUP, Q_ROUNDS, Q_SLOTS, QTILE_W, TILE_H, TILE_W, _round_up,
        pack_attr_coef,
    )
    from paperrenderer_tpu.ops.static_batch import expand_static

    W, H = args.width, args.height
    eng, rp, cam = build_dynamic_scene(args.n, W, H)
    arrays = eng.begin_frame()
    slots, visible, table = rp._device_inputs(arrays.capacity)
    mapping = rp._current_mapping()
    tables = eng.scene.tables()
    cm = cam.matrices
    _ldr, aux = rp.render(cam)
    p_cap = rp._work_capacity
    print(f"tris={int(aux['total_tris'])} p_cap={p_cap}", flush=True)

    batch, _ = expand_static(mapping, arrays, tables, cm, slots, visible)
    batch = jax.block_until_ready(jax.jit(lambda b: b)(batch))

    # replicate the pair-stream construction up to the sort inputs
    coeffs, ok, (lo, hi) = triangle_coefficients(batch, W, H)
    t = batch.capacity
    t_pad = _round_up(t, GROUP)
    ng = t_pad // GROUP
    n_tx = W // TILE_W
    n_ty = H // TILE_H
    n_tiles = n_tx * n_ty

    @jax.jit
    def spans(batch):
        coeffs, ok, (lo, hi) = triangle_coefficients(batch, W, H)
        lo_m = jnp.where(ok[:, None], lo, jnp.inf)
        hi_m = jnp.where(ok[:, None], hi, -jnp.inf)
        lo_m = jnp.pad(lo_m, ((0, t_pad - t), (0, 0)),
                       constant_values=jnp.inf)
        hi_m = jnp.pad(hi_m, ((0, t_pad - t), (0, 0)),
                       constant_values=-jnp.inf)
        glo = lo_m.reshape(ng, GROUP, 2).min(axis=1)
        ghi = hi_m.reshape(ng, GROUP, 2).max(axis=1)
        alive = jnp.isfinite(glo[:, 0])
        fglo = jnp.nan_to_num(glo, posinf=0.0)
        fghi = jnp.nan_to_num(ghi, neginf=0.0)
        bw = QTILE_W
        n_bx = W // bw
        gx0 = jnp.clip(jnp.floor(fglo[:, 0] / bw).astype(jnp.int32), 0,
                       n_bx - 1)
        gx1 = jnp.clip(jnp.floor(fghi[:, 0] / bw).astype(jnp.int32), 0,
                       n_bx - 1)
        gy0 = jnp.clip(jnp.floor(fglo[:, 1] / TILE_H).astype(jnp.int32), 0,
                       n_ty - 1)
        gy1 = jnp.clip(jnp.floor(fghi[:, 1] / TILE_H).astype(jnp.int32), 0,
                       n_ty - 1)
        gx1 = jnp.maximum(gx1, gx0)
        gy1 = jnp.maximum(gy1, gy0)
        spanw = gx1 - gx0 + 1
        count = jnp.where(alive, spanw * (gy1 - gy0 + 1), 0)
        ends = jnp.cumsum(count)
        offsets = ends - count
        info = jnp.stack([offsets, gx0, gy0, spanw], axis=-1)
        return info, count, ends[-1]

    ms = timeit(spans, (batch,), args.iters)
    info, count, n_pairs = jax.block_until_ready(spans(batch))
    print(f"coeffs+spans     {ms:8.2f} ms   n_pairs={int(n_pairs)}",
          flush=True)

    n_bx = W // QTILE_W
    n_cells = n_tiles * 4

    @jax.jit
    def pair_keys(info, count, n_pairs):
        offsets = info[:, 0]
        write = jnp.where(count > 0, offsets, p_cap)
        start_marks = jnp.full((p_cap,), -1, jnp.int32).at[write].set(
            jnp.arange(ng, dtype=jnp.int32), mode="drop")
        pair_group = jax.lax.cummax(start_marks)
        slot = jnp.arange(p_cap, dtype=jnp.int32)
        pvalid = (slot < n_pairs) & (pair_group >= 0)
        pg = jnp.maximum(pair_group, 0)
        gi = info[pg]
        within = slot - gi[:, 0]
        by = gi[:, 2] + within // gi[:, 3]
        bx = gi[:, 1] + within % gi[:, 3]
        cell = by * n_bx + bx
        keys = jnp.where(pvalid, cell, n_cells)
        vals = jnp.where(pvalid, pg, -1)
        return keys, vals

    ms = timeit(pair_keys, (info, count, n_pairs), args.iters)
    keys, vals = jax.block_until_ready(pair_keys(info, count, n_pairs))
    print(f"pair expansion   {ms:8.2f} ms", flush=True)

    @jax.jit
    def do_sort(keys, vals):
        return jax.lax.sort((keys, vals), num_keys=1)

    ms = timeit(do_sort, (keys, vals), args.iters)
    cell_s, group_s = jax.block_until_ready(do_sort(keys, vals))
    print(f"lax.sort         {ms:8.2f} ms   (P={p_cap})", flush=True)

    @jax.jit
    def post_sort(cell_s, group_s):
        slot = jnp.arange(p_cap, dtype=jnp.int32)
        starts = jnp.searchsorted(
            cell_s, jnp.arange(n_cells + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        hist = (starts[1:] - starts[:-1]).reshape(n_tiles, 4)
        rounds = hist.max(axis=1)
        steps_t = -(-rounds // Q_ROUNDS)
        step_start = jnp.cumsum(steps_t) - steps_t
        total_steps = step_start[-1] + steps_t[-1]
        cell_c = jnp.minimum(cell_s, n_cells - 1)
        k = slot - starts[cell_c]
        dst = ((step_start[cell_c // 4] + k // Q_ROUNDS) * Q_SLOTS
               + 4 * (k % Q_ROUNDS) + cell_c % 4)
        ok_s = (group_s >= 0) & (dst < p_cap)
        write2 = jnp.where(ok_s, dst, p_cap)
        padded_group = jnp.full((p_cap,), -1, jnp.int32).at[write2].set(
            group_s, mode="drop")
        return padded_group, total_steps

    ms = timeit(post_sort, (cell_s, group_s), args.iters)
    padded_group, total_steps = jax.block_until_ready(
        post_sort(cell_s, group_s))
    print(f"dst scatter      {ms:8.2f} ms   steps={int(total_steps)}",
          flush=True)

    @jax.jit
    def post_sort_v2(cell_s, group_s):
        """The shipped gather-free variant (sorted-run cummax tricks)."""
        slot = jnp.arange(p_cap, dtype=jnp.int32)
        starts = jnp.searchsorted(
            cell_s, jnp.arange(n_cells + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        hist = (starts[1:] - starts[:-1]).reshape(n_tiles, 4)
        rounds = hist.max(axis=1)
        steps_t = -(-rounds // Q_ROUNDS)
        step_start = jnp.cumsum(steps_t) - steps_t
        total_steps = step_start[-1] + steps_t[-1]
        cell_c = jnp.minimum(cell_s, n_cells - 1)
        newcell = jnp.concatenate(
            [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]])
        run_start = jax.lax.cummax(jnp.where(newcell, slot, -1))
        k = slot - run_start
        pos_t = starts[0:n_cells:4]
        ss_marks = jnp.zeros((p_cap,), jnp.int32).at[pos_t].max(
            step_start, mode="drop")
        step_start_pe = jax.lax.cummax(ss_marks)
        dst = ((step_start_pe + k // Q_ROUNDS) * Q_SLOTS
               + 4 * (k % Q_ROUNDS) + cell_c % 4)
        ok_s = (group_s >= 0) & (dst < p_cap)
        write2 = jnp.where(ok_s, dst, p_cap)
        padded_group = jnp.full((p_cap,), -1, jnp.int32).at[write2].set(
            group_s, mode="drop")
        return padded_group, total_steps

    ms = timeit(post_sort_v2, (cell_s, group_s), args.iters)
    pg2_new, ts2 = jax.block_until_ready(post_sort_v2(cell_s, group_s))
    import numpy as _np
    same = bool(_np.array_equal(_np.asarray(pg2_new),
                                _np.asarray(padded_group)))
    print(f"dst scatter v2   {ms:8.2f} ms   match={same}", flush=True)

    tbl = pack_attr_coef(batch, coeffs)
    tbl = jnp.pad(tbl, ((0, t_pad - t), (0, 0)))
    gt = tbl[:, :16].reshape(ng, GROUP * 16)
    gt = jnp.concatenate([gt, jnp.zeros((1, GROUP * 16), jnp.float32)],
                         axis=0)
    gt = jax.block_until_ready(gt)

    @jax.jit
    def do_gather(gt, padded_group):
        pg2 = jnp.where(padded_group >= 0, padded_group, ng)
        return gt[pg2]

    ms = timeit(do_gather, (gt, padded_group), args.iters)
    print(f"cf gather [P,128]{ms:8.2f} ms", flush=True)

    # how much padding the rounds cost
    import numpy as np

    print(f"pad ratio: steps*16 / pairs = "
          f"{int(total_steps) * Q_SLOTS / max(int(n_pairs), 1):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
