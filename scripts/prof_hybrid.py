"""Profile the hybrid frame (BASELINE config 4) stage by stage.

Usage: python scripts/prof_hybrid.py [--width 1920 --height 1080]
Stage timings are standalone-jit (overstate by dispatch ~2-4 ms each);
the composed number is the one of record.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, iters=5, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/paperrenderer_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from examples.render_hybrid import build_hybrid_scene
    from paperrenderer_tpu.ops import accel as ACC
    from paperrenderer_tpu.ops import trace as T
    from paperrenderer_tpu.ops.raster_exact import (
        rasterize_exact, resolve_gbuffer_pairs,
    )
    from paperrenderer_tpu.ops.static_batch import expand_static
    from paperrenderer_tpu.ops.trace import RTParams

    W, H = args.width, args.height
    eng, hy, cam_obj = build_hybrid_scene(W, H)
    rp = hy._rp
    cam = cam_obj.matrices
    scene = eng.scene
    instances = scene.flush()
    blasset, meta, anim_rest, anim_nodes = hy.accel.blas()
    inst_blas = hy.accel.inst_blas(instances.capacity)
    tri_attr = hy.accel.tri_attr()
    slots, visible, table = rp._device_inputs(instances.capacity)
    mapping = rp._current_mapping()
    tables = scene.tables()
    ss = hy.accel.stack_size(instances.capacity)
    print("composed:", timeit(lambda: hy.render(cam_obj)[0], iters=5), flush=True)

    # --- stage: raster G-buffer -------------------------------------------
    @jax.jit
    def gbuffer(instances, slots, visible, cam):
        batch, _ = expand_static(mapping, instances, tables, cam, slots, visible)
        depth, tid, attr, _req = rasterize_exact(batch, W, H)
        gbuf = resolve_gbuffer_pairs(attr, depth, tid, cam)
        return gbuf, depth

    print("gbuffer (expand+raster+resolve):",
          timeit(lambda: gbuffer(instances, slots, visible, cam)), flush=True)
    gbuf, depth = gbuffer(instances, slots, visible, cam)

    # --- stage: TLAS assemble (tracer ctx) --------------------------------
    use_pallas_trace = jax.default_backend() not in ("cpu",)
    paged = use_pallas_trace and ACC.prefer_paged(
        meta, instances.capacity, max(1, scene.max_slots))
    mask = (jnp.ones(instances.capacity, bool),)

    def make_ctx(instances):
        return ACC.make_scene_tracer(
            blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
            mask, tri_attr, slots, table, tlas_index=0, stack_size=ss,
            leaf_cutout=False, use_pallas=use_pallas_trace, paged=paged,
            textures=rp._cached_textures, time=jnp.float32(0.0),
            animate=None, image_shape=(H, W),
        )

    @jax.jit
    def assemble(instances):
        ctx = make_ctx(instances)
        return ctx.scene.nodes

    print("tlas assemble:", timeit(lambda: assemble(instances)), flush=True)

    def make_surf(gbuf, depth):
        cov = gbuf.coverage.reshape(-1)
        return T.SurfaceHits(
            world_pos=gbuf.world_pos.reshape(-1, 3),
            normal=gbuf.normal.reshape(-1, 3),
            uv=gbuf.uv.reshape(-1, 2),
            material=gbuf.material.reshape(-1),
            valid=cov,
            t=jnp.where(cov, depth.reshape(-1), jnp.inf),
        )

    key = jax.random.PRNGKey(7)
    lights = rp.lights

    @jax.jit
    def shadows(instances, gbuf, depth, key):
        ctx = make_ctx(instances)
        return T.shadow_visibility(make_surf(gbuf, depth), ctx, lights, key, 2)

    print("shadows(2):",
          timeit(lambda: shadows(instances, gbuf, depth, key)), flush=True)

    @jax.jit
    def ao(instances, gbuf, depth, key):
        ctx = make_ctx(instances)
        return T.ambient_occlusion(
            make_surf(gbuf, depth), ctx, table, key, 2, 2.0)

    print("ao(2):", timeit(lambda: ao(instances, gbuf, depth, key)), flush=True)

    params = RTParams(shadow_samples=2, reflection_samples=1, ao_samples=2,
                      ao_radius=2.0, leaf_cutout=False,
                      reflection_half_rate=False)

    @jax.jit
    def refl(instances, gbuf, depth, key):
        ctx = make_ctx(instances)
        return T.reflections(
            make_surf(gbuf, depth), ctx, table, lights, cam.cam_pos, key,
            params)

    print("reflections:",
          timeit(lambda: refl(instances, gbuf, depth, key)), flush=True)

    from paperrenderer_tpu.ops.shading import shade_gbuffer
    from paperrenderer_tpu.ops.tonemap import tonemap

    svis = shadows(instances, gbuf, depth, key)
    aov = ao(instances, gbuf, depth, key)

    @jax.jit
    def shade(gbuf, svis, aov):
        hdr = shade_gbuffer(
            gbuf, table, lights, cam.cam_pos,
            shadow_vis=svis.reshape(-1, H, W),
            ambient_occlusion=aov.reshape(H, W),
            background=T.BACKGROUND_RGB, textures=rp._cached_textures)
        return tonemap(hdr, rp.tonemap_params)

    print("shade+tonemap:", timeit(lambda: shade(gbuf, svis, aov)), flush=True)


if __name__ == "__main__":
    main()
