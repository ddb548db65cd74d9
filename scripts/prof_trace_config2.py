"""Device-trace the COMPOSED config-2 frame and print the top HLO ops.

Stage-level standalone jits overstate (relayout + dispatch); this uses
jax.profiler to attribute the composed frame's device time op by op.

Usage: python scripts/prof_trace_config2.py [--n 10000] [--top 30]
Parses the raw .xplane.pb via tensorflow's profiler proto if available,
else falls back to printing the trace dir for manual inspection.
"""

import argparse
import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10000)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

    from examples.render_dynamic import build_dynamic_scene

    eng, rp, cam = build_dynamic_scene(args.n, args.width, args.height)
    # warm
    for _ in range(3):
        out = rp.render(cam)
    jax.block_until_ready(out)

    logdir = "/tmp/pr_trace_config2"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        out = rp.render(cam)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    # find the xplane file
    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("trace files:", files)
    if not files:
        return
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore
    except Exception:
        try:
            from tsl.profiler.protobuf import xplane_pb2  # type: ignore
        except Exception:
            print("no xplane proto available; inspect", logdir)
            return
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[0], "rb").read())
    import collections

    totals = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[name] += ev.duration_ps / 1e9  # ms
    for name, ms in totals.most_common(args.top):
        print(f"{ms/3.0:9.3f} ms  {name}")


if __name__ == "__main__":
    main()
