"""Profile the paged (chunked-TLAS) tracer: stage times + step counts.

Usage: python scripts/prof_paged.py [--n 10000] [--size 1024]
"""
import argparse, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def slope_time(fn, *args, n1=4, reps=3):
    """Median-of-reps two-point slope (see bench.py) in ms."""
    import jax, statistics
    out = None
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    sl = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n1): out = fn(*args)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        for _ in range(3 * n1): out = fn(*args)
        jax.block_until_ready(out)
        t2 = time.perf_counter()
        sl.append(((t2 - t1) - (t1 - t0)) / (2 * n1))
    return statistics.median(sl) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10000)
    p.add_argument("--size", type=int, default=1024)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from examples.render_crowd import build_crowd_scene
    from paperrenderer_tpu.ops import accel as A
    from paperrenderer_tpu.ops import trace as T

    scene, registry, rt, cam = build_crowd_scene(args.n, args.size, args.size)
    W = H = args.size

    # composed frame of record
    out = None
    t0 = time.perf_counter()
    out, _ = rt.render(cam)
    jax.block_until_ready(out)
    print(f"first frame+compile: {time.perf_counter()-t0:.1f}s")
    print(f"composed frame: {slope_time(lambda: rt.render(cam)[0]):.1f} ms")

    # build the paged tracer pieces directly
    tr = rt._tracer_for(cam) if hasattr(rt, "_tracer_for") else None
    # mirror render() internals
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    instances = scene.flush()
    inst_blas = np.zeros(instances.capacity, np.int32)
    for inst in scene.instances:
        inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
    inst_blas = jnp.asarray(inst_blas)
    tri_attr = A.build_tri_attr(scene)
    mask = jnp.ones(instances.capacity, bool)
    slots = rt._slot_material_array(instances.capacity)

    @jax.jit
    def assemble(instances, inst_blas, mask, slots, tri_attr):
        ps, _ = A.assemble_scene_paged(
            blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
            mask, slots, tri_attr)
        return ps

    ps = assemble(instances, inst_blas, mask, slots, tri_attr)
    _, root = A.assemble_scene_paged(
        blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
        mask, slots, tri_attr)
    print(f"paged assemble: {slope_time(assemble, instances, inst_blas, mask, slots, tri_attr):.1f} ms")

    ss = A.required_stack_size(meta, instances.capacity)
    tracer = A.PagedSceneTracer(
        ps, slots, rt.materials.table(), root_code=root, stack_size=ss,
        use_pallas=True, wide=rt.bvh_wide, image_shape=(H, W))
    print("scene: static_nodes", ps.static_nodes.shape, "leaf_rows",
          ps.leaf_rows.shape, "chunks", ps.chunk_codes.shape[0] // (A.BROWS * 2))

    tiled = T.pick_tile(W, H)
    o, d = T.raygen(cam.matrices, W, H, tile_order=tiled)
    r = o.shape[0]
    tmax = jnp.full((r,), 1000.0)

    prim = jax.jit(lambda ps, o, d, tm: tracer.trace_resolve(o, d, tm))
    surf = prim(ps, o, d, tmax)
    print(f"primary trace+resolve: {slope_time(prim, ps, o, d, tmax):.1f} ms")

    # plain closest-hit (no resolve)
    pc = jax.jit(lambda ps, o, d, tm: tracer.trace(o, d, tm).t)
    print(f"primary closest-hit only: {slope_time(pc, ps, o, d, tmax):.1f} ms")

    # any-hit shadow wavefront from the surface
    key = jax.random.PRNGKey(0)
    def shad(ps, surf, key):
        return T.shadow_visibility(surf, tracer, rt.lights, key, 1)
    js = jax.jit(shad)
    print(f"shadow wavefront: {slope_time(js, ps, surf, key):.1f} ms")

    # step counts (debug_steps)
    from paperrenderer_tpu.ops.trace_paged import trace_scene_pallas_paged
    rec = trace_scene_pallas_paged(
        ps, o, d, tmax, root_code=root, stack_size=ss,
        max_steps=tracer._step_bound(), image_shape=(H, W),
        wide=rt.bvh_wide, debug_steps=True)
    steps = np.asarray(rec.bary[..., 0]).reshape(-1)
    # one step count per packet (1024 rays)
    per_packet = steps.reshape(-1, 1)[::1]
    print(f"primary steps/packet: mean {steps.mean():.0f} max {steps.max():.0f}"
          f" p50 {np.percentile(steps,50):.0f} p90 {np.percentile(steps,90):.0f}")
    n_pk = r // 1024
    print(f"packets: {n_pk}; total step-sum/1e6: {steps.reshape(n_pk, 1024)[:,0].sum()/1e6:.2f}")


if __name__ == "__main__":
    main()
