"""Validate the paged packet traversal against the XLA path.

CPU (interpret mode): build a 600-instance scene (4 TLAS chunks), compare
trace_scene_pallas_paged vs trace_scene on the flattened view.
TPU: same comparison compiled, plus Mrays/s at 1080p-scale ray counts for a
10k-instance scene (the VERDICT r3 item-2 acceptance metric).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")


def build_many_instance_scene(n_inst, seed=0):
    from paperrenderer_tpu.core import (
        Camera, Material, MaterialRegistry, Model, ModelInstance, Scene,
        make_cube, make_uv_sphere,
    )
    from paperrenderer_tpu.render import RenderPass

    rng = np.random.default_rng(seed)
    scene = Scene()
    registry = MaterialRegistry()
    sphere = Model.from_mesh(
        scene.arena, *make_uv_sphere(radius=0.5, rings=6, sectors=8))
    cube = Model.from_mesh(scene.arena, *make_cube(size=0.7))
    rp = RenderPass(scene, registry, width=64, height=64)
    red = Material("red", albedo=(0.8, 0.2, 0.2), roughness=0.5)
    blue = Material("blue", albedo=(0.2, 0.2, 0.8), roughness=0.5)
    side = max(4.0, float(n_inst) ** (1 / 3) * 1.3)
    for i in range(n_inst):
        m = ModelInstance(sphere if i % 2 == 0 else cube)
        p = rng.uniform(-side, side, 3)
        m.set_transform(pos=tuple(p))
        rp.add_instance(m, {0: (red if i % 2 else blue).instance()})
    cam = Camera(yfov_deg=60.0, aspect=1.0, near=0.1, far=1000.0)
    cam.look_at((0.0, -2.6 * side, 1.2 * side), (0, 0, 0), up=(0, 0, 1))
    return scene, registry, rp, cam


def assemble_both(scene, rp):
    from paperrenderer_tpu.ops import accel as A

    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    instances = scene.flush()
    inst_blas = np.zeros(instances.capacity, np.int32)
    for inst in scene.instances:
        inst_blas[inst.index] = meta.blas_of_model[inst.model.model_id]
    inst_blas = jnp.asarray(inst_blas)
    tri_attr = A.build_tri_attr(scene)
    slots = rp._slot_material_array(instances.capacity)
    mask = jnp.ones(instances.capacity, bool)
    paged, proot = A.assemble_scene_paged(
        blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
        mask, slots, tri_attr)
    flat, remap_root = A.paged_to_flat(paged)
    ss = A.required_stack_size(meta, instances.capacity)
    return paged, proot, flat, remap_root(proot), ss, instances, slots


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=600)
    ap.add_argument("--rays", type=int, default=64)
    ap.add_argument("--perf", action="store_true")
    ap.add_argument("--no-xla", action="store_true",
                    help="skip the XLA comparison (perf-only runs: the flat "
                         "lockstep path compiles for minutes at 10k+ capacity)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax._src.xla_bridge._clear_backends()
        from paperrenderer_tpu.ops import trace_paged as TP

        TP.INTERPRET = True
    from paperrenderer_tpu.ops import accel as A
    from paperrenderer_tpu.ops import trace_paged as TP
    from paperrenderer_tpu.ops.trace import raygen
    from paperrenderer_tpu.ops.trace_kernel import traversal_step_bound

    print("backend:", jax.default_backend())
    scene, registry, rp, cam = build_many_instance_scene(args.n)
    paged, proot, flat, froot, ss, instances, slots = assemble_both(scene, rp)
    nc = paged.chunk_boxes.shape[0] // (A.BROWS * 12)
    print(f"instances={args.n} capacity={instances.capacity} chunks={nc} "
          f"static_nodes={paged.static_nodes.shape[0]} "
          f"leaves={paged.leaf_rows.shape[0]} stack={ss}")

    o, d = raygen(cam.matrices, args.rays, args.rays)
    t_max = jnp.full(o.shape[0], 1e4)
    bound = traversal_step_bound(flat, instances.capacity)

    rec_p = TP.trace_scene_pallas_paged(
        paged, o, d, t_max, root_code=proot, stack_size=ss, max_steps=bound)
    rec_p.t.block_until_ready()
    if args.no_xla:
        print(f"paged hit rate: {float(rec_p.hit.mean()):.4f} (no XLA check)")
        if args.perf:
            run_perf(TP, paged, proot, ss, bound, cam)
        return
    rec_x = A.trace_scene(
        flat, o, d, t_max, root_code=froot, stack_size=ss)
    hp = np.asarray(rec_p.hit)
    hx = np.asarray(rec_x.hit)
    print(f"hit rate paged={hp.mean():.4f} xla={hx.mean():.4f} "
          f"agree={(hp == hx).mean():.6f}")
    both = hp & hx
    if both.any():
        tp = np.asarray(rec_p.t)[both]
        tx = np.asarray(rec_x.t)[both]
        print(f"t close: {np.allclose(tp, tx, rtol=1e-4, atol=1e-4)}; "
              f"prim agree: "
              f"{(np.asarray(rec_p.prim)[both] == np.asarray(rec_x.prim)[both]).mean():.5f}; "
              f"inst agree: "
              f"{(np.asarray(rec_p.inst)[both] == np.asarray(rec_x.inst)[both]).mean():.5f}")

    # any-hit mode
    rec_a = TP.trace_scene_pallas_paged(
        paged, o, d, t_max, root_code=proot, stack_size=ss, max_steps=bound,
        any_hit=True)
    ha = np.asarray(rec_a.hit)
    print(f"any-hit agree: {(ha == hx).mean():.6f}")

    # fused resolve vs XLA resolve on the flat view
    table = rp.materials.table()
    out = TP.trace_resolve_scene_pallas_paged(
        paged, o, d, t_max, root_code=proot, stack_size=ss, max_steps=bound,
        n_slots=slots.shape[1])
    tracer = A.SceneTracer(flat, slots, table, root_code=froot,
                           stack_size=ss, use_pallas=False)
    surf = tracer.resolve(rec_x, o, d)
    hk = np.asarray(out["prim"]) >= 0
    print(f"resolve hit agree: {(hk == np.asarray(surf.valid)).mean():.6f}")
    h = hk & np.asarray(surf.valid)
    if h.any():
        nrm = np.asarray(out["normal"])[h]
        nrm = nrm / np.maximum(
            np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        dd = np.asarray(d)[h]
        fac = (nrm * dd).sum(-1) < 0
        nrm = np.where(fac[:, None], nrm, -nrm)
        print(f"resolve mat agree: "
              f"{(np.asarray(out['material'])[h] == np.asarray(surf.material)[h]).mean():.5f}; "
              f"uv close: "
              f"{np.allclose(np.asarray(out['uv'])[h], np.asarray(surf.uv)[h], atol=1e-3)}; "
              f"normal close: "
              f"{np.allclose(nrm, np.asarray(surf.normal)[h], atol=2e-3)}")

    if args.perf:
        run_perf(TP, paged, proot, ss, bound, cam)


def run_perf(TP, paged, proot, ss, bound, cam):
    from paperrenderer_tpu.ops.trace import raygen

    for size in (1024,):
        w = h = size
        for tiled in (False, True):
            if tiled:
                # 32x32-pixel tile order: each 1024-ray packet is one tile
                # (tight frustum footprint), built by index arithmetic only
                import jax.numpy as jnp2
                th, tw = 32, 32
                idx = jnp2.arange(w * h)
                tile_id = idx // (th * tw)
                within = idx % (th * tw)
                ty, tx = tile_id // (w // tw), tile_id % (w // tw)
                yy = ty * th + within // tw
                xx = tx * tw + within % tw
                o, d = raygen(cam.matrices, w, h)
                # direct tiled raygen: recompute ray dirs at (xx, yy)
                o2d = o.reshape(h, w, 3)
                d2d = d.reshape(h, w, 3)
                o = o2d.reshape(-1, 3)  # origins identical (pinhole)
                d = d2d[yy, xx]          # ONE gather to build the experiment
            else:
                o, d = raygen(cam.matrices, w, h)
            r = o.shape[0]
            t_max = jnp.full(r, 1e4)
            rec = TP.trace_scene_pallas_paged(
                paged, o, d, t_max, root_code=proot, stack_size=ss,
                max_steps=bound)
            rec.t.block_until_ready()
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                rec = TP.trace_scene_pallas_paged(
                    paged, o, d, t_max, root_code=proot, stack_size=ss,
                    max_steps=bound)
            rec.t.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            print(f"[{size}x{size} tiled={tiled}] paged: {dt*1e3:.2f} ms "
                  f"{r/dt/1e6:.2f} Mrays/s "
                  f"(hit rate {float(rec.hit.mean()):.3f})")


if __name__ == "__main__":
    main()
