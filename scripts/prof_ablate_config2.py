"""Ablation profile of the COMPOSED config-2 frame (10k @ 1080p).

Standalone per-stage jits overstate (argument relayout + dispatch dominate —
see docs/PERF.md "Stage-timing caveat"). This measures each stage's cost
IN CONTEXT by re-jitting the composed frame with one stage replaced by a
cheap same-shape substitute and differencing against the full frame.

Usage: python scripts/prof_ablate_config2.py [--n 10000] [--iters 10]
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
    p.add_argument("--n", type=int, default=10000)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

    from examples.render_dynamic import build_dynamic_scene
    from paperrenderer_tpu.ops.raster import GBuffer
    from paperrenderer_tpu.ops.raster_exact import (
        rasterize_exact, resolve_gbuffer_pairs,
    )
    from paperrenderer_tpu.ops.shading import shade_gbuffer
    from paperrenderer_tpu.ops.static_batch import expand_static
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

    def frame(arrays, slots, visible, table, *, do_resolve=True,
              do_shade=True, do_tonemap=True, stop_after_raster=False):
        batch, _vis = expand_static(mapping, arrays, tables, cm, slots,
                                    visible)
        depth, tid, attr_pairs, _req = rasterize_exact(
            batch, W, H, pair_capacity=work_cap or None)
        if stop_after_raster:
            return depth.sum() + tid.sum() + attr_pairs.sum()
        if do_resolve:
            gbuf = resolve_gbuffer_pairs(attr_pairs, depth, tid, cm)
        else:
            # same shapes/dtypes, elementwise only (no row gathers)
            d3 = depth[..., None]
            gbuf = GBuffer(
                depth=depth, tri_id=tid,
                world_pos=jnp.concatenate([d3, d3 * 0.5, d3 * 0.25], -1),
                normal=jnp.concatenate(
                    [d3 * 0, d3 * 0, jnp.ones_like(d3)], -1),
                uv=jnp.concatenate([d3 * 0.1, d3 * 0.2], -1),
                material=jnp.maximum(tid, 0) % 4,
            )
            # keep the attr table live so raster isn't dead-code'd
            gbuf = GBuffer(
                depth=gbuf.depth + attr_pairs[0, 0] * 0, tri_id=gbuf.tri_id,
                world_pos=gbuf.world_pos, normal=gbuf.normal, uv=gbuf.uv,
                material=gbuf.material)
        if do_shade:
            hdr = shade_gbuffer(gbuf, table, rp.lights, cm.cam_pos)
        else:
            hdr = (gbuf.normal * 0.5 + 0.5) * gbuf.world_pos
        if do_tonemap:
            ldr = tonemap(hdr, rp.tonemap_params)
        else:
            ldr = jnp.clip(hdr, 0.0, 1.0)
        return ldr

    import functools

    variants = {
        "full": {},
        "raster_only": dict(stop_after_raster=True),
        "no_resolve": dict(do_resolve=False),
        "no_shade": dict(do_shade=False),
        "no_tonemap": dict(do_tonemap=False),
    }
    times = {}
    for name, kw in variants.items():
        fn = jax.jit(functools.partial(frame, **kw))
        times[name] = timeit(fn, (arrays, slots, visible, table), args.iters)
        print(f"{name:14s} {times[name]:8.2f} ms", flush=True)

    full = times["full"]
    print(f"\ncomposed stage costs (full - ablated):")
    print(f"  resolve  {full - times['no_resolve']:8.2f} ms")
    print(f"  shade    {full - times['no_shade']:8.2f} ms")
    print(f"  tonemap  {full - times['no_tonemap']:8.2f} ms")
    print(f"  expand+raster floor: {times['raster_only']:8.2f} ms")


if __name__ == "__main__":
    main()
