"""Device-trace a composed frame and print top HLO ops (xplane_top parser).

Usage: python scripts/prof_trace.py [--target config2|config5|rt|hybrid|crowd]
           [--top 30] [--loops 3]

Standalone per-stage jits overstate (relayout/dispatch); this attributes
the COMPOSED frame's device time op by op via jax.profiler + the local
wire-format .xplane.pb parser (scripts/xplane_top.py).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(target):
    if target in ("config2", "config5"):
        from examples.render_dynamic import build_dynamic_scene

        n = 10000 if target == "config2" else 100000
        eng, rp, cam = build_dynamic_scene(n, 1920, 1080)
        return lambda: rp.render(cam)[0]
    if target == "rt":
        from examples.render_rt import build_rt_scene

        eng, rt, cam = build_rt_scene(1920, 1080)
        return lambda: rt.render(cam)[0]
    if target == "hybrid":
        from examples.render_hybrid import build_hybrid_scene

        eng, hy, cam = build_hybrid_scene(1920, 1080)
        return lambda: hy.render(cam)[0]
    if target == "crowd":
        from examples.render_crowd import build_crowd_scene

        scene, registry, rt, cam = build_crowd_scene(10000, 1024, 1024)
        return lambda: rt.render(cam)[0]
    raise SystemExit(f"unknown target {target}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--target", default="config2")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--loops", type=int, default=3)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
    frame = build(args.target)

    out = None
    for _ in range(3):
        out = frame()
    jax.block_until_ready(out)

    logdir = f"/tmp/pr_trace_{args.target}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(args.loops):
        out = frame()
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not files:
        print("no trace file under", logdir)
        return
    from xplane_top import top_ops

    rows = top_ops(files[0], plane_filter="TPU", loops=args.loops,
                   line_filter="XLA Ops")
    total = sum(ms for ms, _ in rows)
    print(f"[{args.target}] total {total:.2f} ms/frame across "
          f"{len(rows)} ops (async copies double-count vs wall)")
    for ms, name in rows[: args.top]:
        print(f"{ms:9.3f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
