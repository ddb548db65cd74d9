"""A/B: per-sample shadow waves vs the origin-shared any-hit bundle.

Measures (1) 2-sample primary shadows, (2) 2-sample secondary shadows, each
as two separate any-hit waves vs one bundle call; then the composed RT frame
(which now bundles via shadow_visibility).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=8, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

    from examples.render_rt import build_rt_scene
    from paperrenderer_tpu.ops import accel as ACC
    from paperrenderer_tpu.ops import trace as T
    from paperrenderer_tpu.ops.trace_kernel import (
        trace_scene_pallas, trace_shadow_bundle_pallas)

    W, H = 1920, 1080
    eng, rt, cam = build_rt_scene(W, H)
    scene = eng.scene
    cm = cam.matrices
    instances = scene.flush()
    blasset, meta, anim_rest, anim_nodes = rt.accel.blas()
    slots, masks, table = rt._device_inputs(instances.capacity)
    ss = rt.accel.stack_size(instances.capacity)
    ctx = ACC.make_scene_tracer(
        blasset, meta, anim_rest, anim_nodes, instances,
        rt.accel.inst_blas(instances.capacity), masks, rt.accel.tri_attr(),
        slots, table, tlas_index=0, stack_size=ss,
        leaf_cutout=False, use_pallas=True, paged=False,
        textures=None, time=jnp.float32(0.0), animate=None, wide=True,
    )
    sc, root = ctx.scene, ctx.root_code
    ms = ctx._step_bound()
    key = jax.random.PRNGKey(1)

    tiled = T.pick_tile(W, H)
    o, d = T.raygen(cm, W, H, tile_order=tiled)
    r = o.shape[0]
    tmax = jnp.full((r,), 1000.0)
    prim = jax.jit(lambda o, d, tm: ctx.trace_resolve(o, d, tm))
    surf = jax.block_until_ready(prim(o, d, tmax))

    def shadow_rays(s):
        lights = rt.lights
        lpos = lights.position[0]
        to_l = lpos - s.world_pos
        dist = jnp.linalg.norm(to_l, axis=-1)
        ldir = to_l / jnp.maximum(dist, 1e-9)[:, None]
        act = s.valid & (jnp.sum(s.normal * ldir, axis=-1) > 0.0)
        so = s.world_pos + s.normal * 5e-3
        tx, ty = T._default_basis(ldir)
        dirs = []
        for si in range(2):
            k = jax.random.fold_in(jax.random.fold_in(key, 0), si)
            r1, r2 = jax.random.uniform(k, (2, r))
            sq = jnp.sqrt(1.0 - r2)
            phi = 2.0 * jnp.pi * r1
            offs = ((jnp.cos(phi) * sq)[:, None] * tx
                    + (jnp.sin(phi) * sq)[:, None] * ty
                    + jnp.sqrt(r2)[:, None] * ldir) * lights.radius[0]
            sd = (lpos + offs) - s.world_pos
            dirs.append(sd / jnp.maximum(
                jnp.linalg.norm(sd, axis=-1, keepdims=True), 1e-9))
        return so, dirs, dist, act

    so, dirs, dist, act = jax.block_until_ready(
        jax.jit(shadow_rays)(surf))

    per = jax.jit(lambda so, d0, d1, dist, act: (
        trace_scene_pallas(sc, so, d0, dist, root_code=root, stack_size=ss,
                           any_hit=True, active=act, wide=True,
                           max_steps=ms).t,
        trace_scene_pallas(sc, so, d1, dist, root_code=root, stack_size=ss,
                           any_hit=True, active=act, wide=True,
                           max_steps=ms).t))
    bun = jax.jit(lambda so, d0, d1, dist, act: trace_shadow_bundle_pallas(
        sc, so, (d0, d1), (dist, dist), root_code=root, stack_size=ss,
        active=act, wide=True, max_steps=ms))
    t_per = timeit(per, so, dirs[0], dirs[1], dist, act)
    t_bun = timeit(bun, so, dirs[0], dirs[1], dist, act)
    print(f"primary shadows 2x per-sample: {t_per:7.2f} ms | "
          f"bundle: {t_bun:7.2f} ms", flush=True)

    # secondary surface
    from paperrenderer_tpu.ops.shading import lookup_material_params
    _, _, rough, metal = lookup_material_params(table, surf.material)
    v = cm.cam_pos - surf.world_pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    ndv = jnp.maximum(jnp.sum(surf.normal * v, axis=-1), 0.0)
    max_angle = rough * (1.0 - jnp.power(1.0 - ndv, 5.0))
    ntx, nty = T._default_basis(surf.normal)
    r1b, r2b = jax.random.uniform(jax.random.fold_in(key, 2000), (2, r))
    pert_n = T._cosine_sample(surf.normal, ntx, nty, max_angle, r1b, r2b)
    rdir = -v + 2.0 * jnp.sum(pert_n * v, axis=-1, keepdims=True) * pert_n
    bo = surf.world_pos + surf.normal * 1e-3
    hit2 = jax.block_until_ready(jax.jit(
        lambda o2, d2, tm, a: ctx.trace_resolve(o2, d2, tm, active=a))(
            bo, rdir, tmax, surf.valid))
    so2, dirs2, dist2, act2 = jax.block_until_ready(
        jax.jit(shadow_rays)(hit2))
    t_per2 = timeit(per, so2, dirs2[0], dirs2[1], dist2, act2)
    t_bun2 = timeit(bun, so2, dirs2[0], dirs2[1], dist2, act2)
    print(f"2nd shadows 2x per-sample:     {t_per2:7.2f} ms | "
          f"bundle: {t_bun2:7.2f} ms", flush=True)

    ldr, _ = rt.render(cam)
    jax.block_until_ready(ldr)
    composed = timeit(lambda: rt.render(cam)[0], iters=5)
    print(f"composed RT frame (bundled shadow_visibility): {composed:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
