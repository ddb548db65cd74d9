"""Round-4 RT stage probe: primary / shadow+AO bundle / bounce / 2nd bundle.

Times each wave standalone with device arrays passed as jit ARGUMENTS
(closed-over constants cost ~2-5 ms/call on axon — see CLAUDE.md), plus the
composed frame for calibration.

Usage: python scripts/prof_rt4.py [--width 1920 --height 1080] [--no-wide]
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
    p.add_argument("--no-wide", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from examples.render_rt import build_rt_scene
    from paperrenderer_tpu.ops import accel as A
    from paperrenderer_tpu.ops import trace as T

    W, H = args.width, args.height
    wide = not args.no_wide
    eng, rt, cam = build_rt_scene(W, H)
    scene = eng.scene

    # composed frame (the number of record)
    img, _ = rt.render(cam)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(4):
        img, _ = rt.render(cam)
    jax.block_until_ready(img)
    print(f"composed frame: {(time.perf_counter() - t0) / 4 * 1e3:.1f} ms")

    # assemble the two-level structure once (host), pass rts as a jit arg
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    instances = scene.flush()
    inst_blas = np.zeros(instances.capacity, np.int32)
    for inst in scene.instances:
        inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
    tri_attr = A.build_tri_attr(scene)
    masks = [jnp.ones(instances.capacity, bool)]
    rts, roots = A.assemble_scene(
        blasset, meta, anim_rest, anim_nodes, instances,
        jnp.asarray(inst_blas), masks, tri_attr)
    ss = A.required_stack_size(meta, instances.capacity)
    slots = rt._slot_material_array(instances.capacity)
    mats = rt.materials.table()
    lights = rt.lights

    def ctx_of(rts):
        return A.SceneTracer(rts, slots, mats, root_code=roots[0],
                             stack_size=ss, use_pallas=True, wide=wide)

    tiled = T.pick_tile(W, H)
    camm = cam.matrices
    o, d = T.raygen(camm, W, H, tile_order=tiled)
    r = o.shape[0]
    tmax = jnp.full((r,), 1000.0)
    key = jax.random.PRNGKey(0)
    n_shadow = rt.shadow_samples
    n_ao = rt.ao_samples
    ao_radius = rt.ao_radius

    prim = jax.jit(lambda rts, o, d, tm: ctx_of(rts).trace_resolve(o, d, tm))
    print(f"primary trace+resolve: {timeit(prim, rts, o, d, tmax):.2f} ms")
    surf = prim(rts, o, d, tmax)

    def bundle1(rts, surf, key):
        return T.shadow_and_ao(
            surf, ctx_of(rts), mats, lights, key, key,
            shadow_samples=max(1, n_shadow),
            ao_samples=n_ao, ao_radius=ao_radius)

    jb1 = jax.jit(bundle1)
    print(f"shadow+AO bundle @primary: {timeit(jb1, rts, surf, key):.2f} ms")

    refl_key = jax.random.fold_in(key, 7)

    def bounce(rts, surf, key):
        rdir = T._reflection_dir(surf, mats, camm.cam_pos, key, 0)
        o2 = surf.world_pos + surf.normal * 1e-3
        return ctx_of(rts).trace_resolve(
            o2, rdir, jnp.full((r,), 1000.0), active=surf.valid)

    jbo = jax.jit(bounce)
    print(f"bounce trace+resolve: {timeit(jbo, rts, surf, refl_key):.2f} ms")
    hit2 = jbo(rts, surf, refl_key)

    k0 = jax.random.fold_in(refl_key, 2000)

    def bundle2(rts, hit2, k0):
        return T.shadow_and_ao(
            hit2, ctx_of(rts), mats, lights,
            jax.random.fold_in(k0, 1), jax.random.fold_in(k0, 2),
            shadow_samples=max(1, n_shadow),
            ao_samples=n_ao, ao_radius=ao_radius)

    jb2 = jax.jit(bundle2)
    print(f"shadow+AO bundle @bounce hits: {timeit(jb2, rts, hit2, k0):.2f} ms")

    valid = float(jnp.mean(surf.valid.astype(jnp.float32)))
    valid2 = float(jnp.mean(hit2.valid.astype(jnp.float32)))
    print(f"primary hit fraction: {valid:.3f}; bounce hit fraction: {valid2:.3f}")


if __name__ == "__main__":
    main()
