"""Benchmark: steady-state raster frames/sec on the bundled example scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so the baseline of record
is self-generated: BASELINE_FPS below is the first measured value of this
config on one TPU v5e chip (round 1, brute-force rasterizer). vs_baseline
therefore tracks speedup across rounds on identical hardware/workload.

Config: BASELINE.json config-1 analogue — the procedural example scene
(5 instances, ~4.1k triangles, 2 point lights, PBR + ACES), raster path,
headless 512x512.
"""

import json
import sys
import time

# Self-generated baseline: round-1 first-working-renderer measurement on one
# TPU v5e chip (brute-force rasterizer, pre-optimization: 6 fps). The static
# expansion + binned Pallas raster path brought round 1 to ~70 fps.
BASELINE_FPS = 6.0

WIDTH = HEIGHT = 512
WARMUP = 2
ITERS = 10


def main():
    from examples.render_scene import (  # reuse the example scene builder
        build_example_scene,
    )

    rp, cam = build_example_scene(WIDTH, HEIGHT)

    # compile + warmup
    for _ in range(WARMUP):
        ldr, _aux = rp.render(cam)
    ldr.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        ldr, _aux = rp.render(cam)
    ldr.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS

    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "raster_fps_example_512",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
