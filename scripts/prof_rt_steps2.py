"""Per-wave traversal step counts + time for the RT example frame @1080p.

For each wavefront (primary, shadow s0, AO, bounce, 2nd shadow, 2nd AO):
packet step-count distribution (debug_steps: the while-loop trip count per
packet) and the wave's wall time, to split per-step cost from per-packet
fixed cost and size the win of bundling same-origin samples into one
traversal. All big arrays are jit ARGUMENTS (see CLAUDE.md measurement
rule).
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
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

    from examples.render_rt import build_rt_scene
    from paperrenderer_tpu.ops import accel as ACC
    from paperrenderer_tpu.ops import trace as T
    from paperrenderer_tpu.ops.trace_kernel import trace_scene_pallas

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
    msteps = ctx.max_steps() if hasattr(ctx, "max_steps") else None
    key = jax.random.PRNGKey(1)

    tiled = T.pick_tile(W, H)
    o, d = T.raygen(cm, W, H, tile_order=tiled)
    r = o.shape[0]
    tmax = jnp.full((r,), 1000.0)

    prim = jax.jit(lambda o, d, tm: ctx.trace_resolve(o, d, tm))
    surf = jax.block_until_ready(prim(o, d, tmax))

    # build each wave's rays exactly like trace_frame does
    lights = rt.lights
    lpos = lights.position[0]
    to_l = lpos - surf.world_pos
    dist = jnp.linalg.norm(to_l, axis=-1)
    ldir = to_l / jnp.maximum(dist, 1e-9)[:, None]
    ndl = jnp.sum(surf.normal * ldir, axis=-1)
    sh_active = surf.valid & (ndl > 0.0)
    sh_o = surf.world_pos + surf.normal * 5e-3
    tx, ty = T._default_basis(ldir)
    r1, r2 = jax.random.uniform(jax.random.fold_in(
        jax.random.fold_in(key, 0), 0), (2, r))
    sq = jnp.sqrt(1.0 - r2)
    phi = 2.0 * jnp.pi * r1
    offs = ((jnp.cos(phi) * sq)[:, None] * tx
            + (jnp.sin(phi) * sq)[:, None] * ty
            + jnp.sqrt(r2)[:, None] * ldir) * lights.radius[0]
    sdir = (lpos + offs) - surf.world_pos
    sdir = sdir / jnp.maximum(
        jnp.linalg.norm(sdir, axis=-1, keepdims=True), 1e-9)

    ntx, nty = T._default_basis(surf.normal)
    r1a, r2a = jax.random.uniform(jax.random.fold_in(key, 1000), (2, r))
    adir = T._cosine_sample(surf.normal, ntx, nty, jnp.ones((r,)), r1a, r2a)
    ao_o = surf.world_pos + surf.normal * 1e-3

    from paperrenderer_tpu.ops.shading import lookup_material_params
    _, _, rough, metal = lookup_material_params(table, surf.material)
    v = cm.cam_pos - surf.world_pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    ndv = jnp.maximum(jnp.sum(surf.normal * v, axis=-1), 0.0)
    max_angle = rough * (1.0 - jnp.power(1.0 - ndv, 5.0))
    r1b, r2b = jax.random.uniform(jax.random.fold_in(key, 2000), (2, r))
    pert_n = T._cosine_sample(surf.normal, ntx, nty, max_angle, r1b, r2b)
    rdir = -v + 2.0 * jnp.sum(pert_n * v, axis=-1, keepdims=True) * pert_n
    bo = surf.world_pos + surf.normal * 1e-3
    bt = jax.jit(lambda o2, d2, tm, act: ctx.trace_resolve(
        o2, d2, tm, active=act))
    hit2 = jax.block_until_ready(bt(bo, rdir, tmax, surf.valid))

    to_l2 = lpos - hit2.world_pos
    dist2 = jnp.linalg.norm(to_l2, axis=-1)
    ldir2 = to_l2 / jnp.maximum(dist2, 1e-9)[:, None]
    sh2_active = hit2.valid & (jnp.sum(hit2.normal * ldir2, axis=-1) > 0.0)
    sh2_o = hit2.world_pos + hit2.normal * 5e-3
    n2tx, n2ty = T._default_basis(hit2.normal)
    r1c, r2c = jax.random.uniform(jax.random.fold_in(key, 3000), (2, r))
    a2dir = T._cosine_sample(hit2.normal, n2tx, n2ty, jnp.ones((r,)),
                             r1c, r2c)

    waves = [
        ("primary", o, d, tmax, None, False),
        ("shadow s0", sh_o, sdir, dist, sh_active, True),
        ("ao", ao_o, adir, jnp.full((r,), rt.ao_radius), surf.valid, False),
        ("bounce", bo, rdir, tmax, surf.valid, False),
        ("2nd shadow", sh2_o, ldir2, dist2, sh2_active, True),
        ("2nd ao", sh2_o, a2dir, jnp.full((r,), rt.ao_radius), hit2.valid,
         False),
    ]

    tr = jax.jit(lambda o_, d_, tm_, a_, ah: trace_scene_pallas(
        sc, o_, d_, tm_, root_code=root, stack_size=ss, any_hit=ah,
        active=a_, wide=True), static_argnames=("ah",))
    dbg = jax.jit(lambda o_, d_, tm_, a_, ah: trace_scene_pallas(
        sc, o_, d_, tm_, root_code=root, stack_size=ss, any_hit=ah,
        active=a_, wide=True, debug_steps=True).bary[:, 0],
        static_argnames=("ah",))

    for name, wo, wd, wt, wa, ah in waves:
        if wa is None:
            wa = jnp.ones((r,), bool)
        t = timeit(tr, wo, wd, wt, wa, ah)
        steps = np.asarray(dbg(wo, wd, wt, wa, ah))[::1024]
        act = float(jnp.mean(wa.astype(jnp.float32)))
        print(f"{name:11s}: {t:7.2f} ms  active={act:.2f}  "
              f"steps/packet mean={steps.mean():7.1f} p50={np.percentile(steps, 50):6.0f} "
              f"p95={np.percentile(steps, 95):6.0f} max={steps.max():6.0f}",
              flush=True)


if __name__ == "__main__":
    main()
