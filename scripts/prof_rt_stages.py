"""Stage split of the full RT frame @1080p with the CURRENT kernels.

Times each wavefront standalone (primary, shadows, AO, shade, and the
reflection side's bounce / 2nd shadows / 2nd AO) plus the composed frame
for calibration. Standalone timings overstate slightly (dispatch +
relayout); the composed number is the one of record.

MEASUREMENT RULE (hard-won): every jitted stage must take its big device
arrays as ARGUMENTS. A `jax.jit(lambda: f(closed_over_arrays))` embeds the
arrays as constants, and on the axon backend constant-carrying executables
cost ~2-5 ms/call extra PER LARGE CONSTANT — the round-3 stage table made
with closures overstated e.g. the AO ray build 25x (4.49 ms vs 0.19 ms
args-passed).

Usage: python scripts/prof_rt_stages.py [--width 1920 --height 1080]
       [--wide]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=8, warmup=2):
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
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--wide", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

    from examples.render_rt import build_rt_scene
    from paperrenderer_tpu.ops import accel as ACC
    from paperrenderer_tpu.ops import trace as T

    W, H = args.width, args.height
    eng, rt, cam = build_rt_scene(W, H)
    if args.wide:
        rt.bvh_wide = True
    scene = eng.scene
    cm = cam.matrices

    ldr, _ = rt.render(cam)
    jax.block_until_ready(ldr)
    composed = timeit(lambda: rt.render(cam)[0], iters=5)
    print(f"composed RT frame: {composed:8.2f} ms "
          f"(shadow_samples={rt.shadow_samples} ao={rt.ao_samples} "
          f"refl={rt.reflection_samples} wide={rt.bvh_wide})", flush=True)

    # build the tracer ctx once (outside jit; its arrays are device-resident)
    instances = scene.flush()
    blasset, meta, anim_rest, anim_nodes = rt.accel.blas()
    slots, masks, table = rt._device_inputs(instances.capacity)
    ss = rt.accel.stack_size(instances.capacity)
    paged = rt.use_pallas and ACC.prefer_paged(
        meta, instances.capacity, max(1, scene.max_slots))
    ctx = ACC.make_scene_tracer(
        blasset, meta, anim_rest, anim_nodes, instances,
        rt.accel.inst_blas(instances.capacity), masks, rt.accel.tri_attr(),
        slots, table, tlas_index=0, stack_size=ss,
        leaf_cutout=False, use_pallas=rt.use_pallas, paged=paged,
        textures=None, time=jnp.float32(0.0), animate=None,
        # NO image_shape: trace_frame feeds tile-order rays (a packet is
        # 1024 consecutive rays = one pixel tile)
        wide=rt.bvh_wide,
    )
    params = T.RTParams(
        shadow_samples=rt.shadow_samples,
        reflection_samples=rt.reflection_samples,
        ao_samples=rt.ao_samples, ao_radius=rt.ao_radius)
    key = jax.random.PRNGKey(1)

    tiled = T.pick_tile(W, H)
    o, d = T.raygen(cm, W, H, tile_order=tiled)
    r = o.shape[0]
    tmax = jnp.full((r,), 1000.0)

    # NOTE: ctx's scene arrays stay closed-over — the constant penalty
    # scales with constant SIZE and this scene's BVH arrays are a few KiB;
    # the 24 MB per-wave arrays (rays, surfaces) are what must be arguments.
    # For big (crowd) scenes pass the scene arrays too.
    prim = jax.jit(lambda o, d, tmax: ctx.trace_resolve(o, d, tmax))
    print(f"primary+resolve:   {timeit(prim, o, d, tmax):8.2f} ms",
          flush=True)
    surf = jax.block_until_ready(prim(o, d, tmax))

    sh = jax.jit(lambda surf, key: T.shadow_visibility(
        surf, ctx, rt.lights, key, max(1, params.shadow_samples)))
    print(f"shadows({params.shadow_samples}):        "
          f"{timeit(sh, surf, key):8.2f} ms", flush=True)
    svis = jax.block_until_ready(sh(surf, key))

    aof = jax.jit(lambda surf, key: T.ambient_occlusion(
        surf, ctx, table, key, params.ao_samples, params.ao_radius))
    print(f"ao({params.ao_samples}):             "
          f"{timeit(aof, surf, key):8.2f} ms", flush=True)
    ao = jax.block_until_ready(aof(surf, key))

    shf = jax.jit(lambda surf, svis, ao: T.shade_surfaces(
        surf, table, rt.lights, cm.cam_pos, svis, ao, None))
    print(f"shade:             {timeit(shf, surf, svis, ao):8.2f} ms",
          flush=True)

    # ---- reflection side, decomposed -----------------------------------
    from paperrenderer_tpu.ops.shading import lookup_material_params
    from paperrenderer_tpu.ops.trace import _cosine_sample, _default_basis

    @jax.jit
    def bounce_rays(surf, key):
        albedo, _, rough, metal = lookup_material_params(
            table, surf.material)
        v = cm.cam_pos - surf.world_pos
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
        n_dot_v = jnp.maximum(jnp.sum(surf.normal * v, axis=-1), 0.0)
        max_angle = rough * (1.0 - jnp.power(1.0 - n_dot_v, 5.0))
        tx, ty = _default_basis(surf.normal)
        k = jax.random.fold_in(jax.random.fold_in(key, 7), 2000)
        r1, r2 = jax.random.uniform(k, (2, r))
        pert_n = _cosine_sample(surf.normal, tx, ty, max_angle, r1, r2)
        rdir = -v + 2.0 * jnp.sum(pert_n * v, axis=-1, keepdims=True) * pert_n
        return surf.world_pos + surf.normal * 1e-3, rdir

    print(f"bounce ray build:  {timeit(bounce_rays, surf, key):8.2f} ms",
          flush=True)
    o2, d2 = jax.block_until_ready(bounce_rays(surf, key))
    bt = jax.jit(lambda o2, d2, tmax, act: ctx.trace_resolve(
        o2, d2, tmax, active=act))
    print(f"bounce trace:      {timeit(bt, o2, d2, tmax, surf.valid):8.2f} ms",
          flush=True)
    hit2 = jax.block_until_ready(bt(o2, d2, tmax, surf.valid))

    sh2 = jax.jit(lambda hit2, key: T.shadow_visibility(
        hit2, ctx, rt.lights, key, max(1, params.shadow_samples)))
    print(f"2nd shadows:       {timeit(sh2, hit2, key):8.2f} ms", flush=True)

    ao2 = jax.jit(lambda hit2, key: T.ambient_occlusion(
        hit2, ctx, table, key, params.ao_samples, params.ao_radius))
    print(f"2nd ao:            {timeit(ao2, hit2, key):8.2f} ms", flush=True)

    cover = float(jnp.mean(surf.valid.astype(jnp.float32)))
    cover2 = float(jnp.mean(hit2.valid.astype(jnp.float32)))
    print(f"primary coverage {cover:.3f}; bounce hit rate {cover2:.3f}")


if __name__ == "__main__":
    main()
