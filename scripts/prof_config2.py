"""Stage-by-stage profile of BASELINE config 2 (10k instances @ 1080p).

Times each frame stage as its own jitted function (pipelined loops, async
dispatch) so optimization work targets the measured bottleneck, not a guess.

Usage: python scripts/prof_config2.py [--n 10000] [--iters 10] [--cpu]
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
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10000)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax._src.xla_bridge._clear_backends()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

    import jax.numpy as jnp
    from functools import partial

    from examples.render_dynamic import build_dynamic_scene
    from paperrenderer_tpu.ops import raster as R
    from paperrenderer_tpu.ops.static_batch import expand_static
    from paperrenderer_tpu.ops.shading import shade_gbuffer
    from paperrenderer_tpu.ops.tonemap import tonemap

    W, H = args.width, args.height
    eng, rp, cam = build_dynamic_scene(args.n, W, H)
    arrays = eng.begin_frame()
    slots, visible, table = rp._device_inputs(arrays.capacity)
    mapping = rp._current_mapping()
    tables = eng.scene.tables()
    cm = cam.matrices
    _ldr, aux = rp.render(cam)  # sizes the work queue
    work_cap = rp._work_capacity
    print(f"tris={int(aux['total_tris'])} work_cap={work_cap} "
          f"required={int(aux['required_work'])}", flush=True)

    # --- stage 1: expand ---------------------------------------------------
    @jax.jit
    def s_expand(mapping, arrays, tables, slots, visible):
        batch, vis = expand_static(mapping, arrays, tables, cm, slots, visible)
        return batch

    ms, batch = timeit(s_expand, (mapping, arrays, tables, slots, visible),
                       args.iters)
    print(f"expand           {ms:8.2f} ms", flush=True)

    # --- stage 2a: coefficients ---------------------------------------------
    from paperrenderer_tpu.ops import raster_exact as RX

    @jax.jit
    def s_coeffs(batch):
        return R.triangle_coefficients(batch, W, H)

    ms, (coeffs, ok, (lo, hi)) = timeit(s_coeffs, (batch,), args.iters)
    print(f"coeffs           {ms:8.2f} ms", flush=True)

    # --- stage 2: full exact-binned raster ----------------------------------
    @jax.jit
    def s_raster(batch):
        return RX.rasterize_exact(
            batch, W, H, pair_capacity=work_cap or None)

    ms, (depth, tid, attr_pairs, req) = timeit(s_raster, (batch,), args.iters)
    print(f"raster (full)    {ms:8.2f} ms  required={int(req)}", flush=True)

    # --- stage 3: resolve ----------------------------------------------------
    @jax.jit
    def s_resolve(attr_pairs, depth, tid):
        return RX.resolve_gbuffer_pairs(attr_pairs, depth, tid, cm)

    ms, gbuf = timeit(s_resolve, (attr_pairs, depth, tid), args.iters)
    print(f"resolve          {ms:8.2f} ms", flush=True)

    @jax.jit
    def s_gather(attr, tid):
        return attr[jnp.maximum(tid, 0)]

    ms, _rows = timeit(s_gather, (attr_pairs, tid), args.iters)
    print(f"  attr gather    {ms:8.2f} ms", flush=True)

    # --- stage 4: shade + tonemap -------------------------------------------
    @jax.jit
    def s_shade(gbuf, table):
        return shade_gbuffer(gbuf, table, rp.lights, cm.cam_pos)

    ms, hdr = timeit(s_shade, (gbuf, table), args.iters)
    print(f"shade            {ms:8.2f} ms", flush=True)

    @jax.jit
    def s_tone(hdr):
        return tonemap(hdr, rp.tonemap_params)

    ms, _ = timeit(s_tone, (hdr,), args.iters)
    print(f"tonemap          {ms:8.2f} ms", flush=True)

    # --- whole frame ---------------------------------------------------------
    from paperrenderer_tpu.render.renderpass import render_frame_static

    @jax.jit
    def s_frame(mapping, arrays, tables, table, slots, visible):
        ldr, aux = render_frame_static(
            mapping, arrays, tables, table, rp.lights, cm, slots, visible,
            rp.tonemap_params, width=W, height=H,
            use_pallas=rp.use_pallas, work_capacity=work_cap)
        return ldr

    ms, _ = timeit(s_frame, (mapping, arrays, tables, table, slots, visible),
                   args.iters)
    print(f"FULL FRAME       {ms:8.2f} ms  ({1000.0/ms:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
