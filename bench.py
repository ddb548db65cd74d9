"""Benchmark: the BASELINE.md metric matrix on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline metric (config-1 raster fps), plus a "metrics" dict carrying the
whole matrix of record (BASELINE.md:27-33):

  config1_raster_fps_512        example scene, raster, 512x512
  config2_raster_ms_10k_1080p   10k instances, full preprocess+raster, 1080p
  config3_primary_mrays_1080p   two-level BVH primary traversal, Mrays/s
  config3_tlas_refit_ms         per-frame TLAS assemble/refit
  config4_hybrid_ms_1080p       hybrid raster G-buffer + RT passes, 1080p
  config5_raster_ms_100k_1080p  100k animated instances, raster, 1080p

The reference publishes no numbers (BASELINE.md), and building it headless
under software Vulkan failed in this environment (no lavapipe/SwiftShader ICD
— see BASELINE.md "reference measurement attempt"). The baseline of record is
therefore self-generated: BASELINE_FPS below is the first measured value of
config 1 on one TPU v5e chip (round 1, brute-force rasterizer).
**vs_baseline is honestly a speedup-over-round-1 number**, NOT a comparison
against the Vulkan reference; image parity with the reference is pinned by
the golden-image tests (tests/test_golden_images.py) instead.

Each config is guarded: a failure records an "error:..." string for that
metric instead of killing the bench.
"""

import json
import os
import statistics
import threading
import time

BASELINE_FPS = 6.0

WARMUP = 2
ITERS = 10

# Tunnel-outage insurance: if the whole bench exceeds this wall-clock (a
# hung axon backend init / mid-bench tunnel drop blocks forever, observed
# 2026-08-18), a watchdog emits the JSON line with whatever metrics were
# collected and hard-exits so the driver still records a BENCH file.
BENCH_DEADLINE_S = int(os.environ.get("BENCH_DEADLINE_S", "2700"))


def _setup_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _window(fn, iters):
    """Wall time of one pipelined window of `iters` calls (seconds)."""
    import jax

    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def _time(fn, iters=ITERS, warmup=WARMUP, reps=5):
    """Per-call time via a two-point slope estimator.

    Every pipelined measurement window through the axon tunnel pays a fixed
    ~20-45 ms pipeline-fill cost after the preceding block_until_ready (one
    tunnel round trip) — measured round 5: a 512^2 frame read 4.9 ms/frame
    from a 10-iter window but 1.9 ms from the (t(3x)-t(x))/2x slope. So:
    time windows of `iters` and `3*iters` calls back-to-back, take the
    slope (the fixed cost cancels exactly), and take the median over
    `reps` repeats (tunnel hiccups inflate single windows by 50-100 ms).

    `warmup` is a floor; at least 9 calls are made so every stride-8
    frame-counter path (e.g. RenderPass's decimated overflow fetch) has
    compiled and run before the timed windows.
    """
    import jax

    out = None
    for _ in range(max(warmup, 9)):
        out = fn()
    jax.block_until_ready(out)
    slopes = []
    for _ in range(reps):
        t1 = _window(fn, iters)
        t2 = _window(fn, 3 * iters)
        slopes.append((t2 - t1) / (2 * iters))
    return statistics.median(slopes)


def bench_config1():
    from examples.render_scene import build_example_scene

    rp, cam = build_example_scene(512, 512)
    dt = _time(lambda: rp.render(cam)[0])
    return 1.0 / dt


def bench_config2():
    from examples.render_dynamic import build_dynamic_scene

    eng, rp, cam = build_dynamic_scene(10_000, 1920, 1080)
    dt = _time(lambda: rp.render(cam)[0], iters=5)
    return dt * 1e3


def bench_config3():
    import jax
    import jax.numpy as jnp

    from examples.render_rt import build_rt_scene
    from paperrenderer_tpu.ops import accel as A
    from paperrenderer_tpu.ops.trace import raygen
    from paperrenderer_tpu.ops.trace_kernel import (
        pallas_traversal_ok, trace_scene_pallas,
    )

    W, H = 1920, 1080
    eng, rt, cam = build_rt_scene(W, H)
    scene = eng.scene
    blasset, meta, anim_rest, anim_nodes = A.build_blas_set(scene)
    instances = scene.flush()
    inst_blas = rt.accel.inst_blas(instances.capacity)
    tri_attr = rt.accel.tri_attr()
    masks = [jnp.ones(instances.capacity, bool)]
    ss = rt.accel.stack_size(instances.capacity)

    @jax.jit
    def tlas_refit(instances, inst_blas, tri_attr):
        rts, _ = A.assemble_scene(
            blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
            masks, tri_attr)
        return rts.nodes

    refit_ms = _time(
        lambda: tlas_refit(instances, inst_blas, tri_attr), iters=10) * 1e3

    rts, roots = A.assemble_scene(
        blasset, meta, anim_rest, anim_nodes, instances, inst_blas,
        masks, tri_attr)
    o, d = raygen(cam.matrices, W, H)
    r = o.shape[0]
    t_max = jnp.full(r, 1000.0)
    if pallas_traversal_ok(rts, r):
        trace = lambda: trace_scene_pallas(
            rts, o, d, t_max, root_code=roots[0], stack_size=ss).t
    else:
        trace = lambda: A.trace_scene(
            rts, o, d, t_max, root_code=roots[0], stack_size=ss).t
    dt = _time(trace, iters=10)
    return r / dt / 1e6, refit_ms


def bench_rt_full_frame():
    """Full RT frame @1080p: primary + 2-sample soft shadows + RTAO +
    1-bounce reflections (the PERF.md headline row; not a BASELINE config but
    the metric the reflection-optimization work is judged by)."""
    from examples.render_rt import build_rt_scene

    eng, rt, cam = build_rt_scene(1920, 1080)
    dt = _time(lambda: rt.render(cam)[0], iters=3, warmup=1)
    return dt * 1e3


def bench_rt_crowd_10k():
    """10k-instance traced scene (chunked-TLAS paging): primary Mrays/s at
    1024x1024 + full-frame ms (1 hard shadow). Round-2 dropped such scenes
    to the XLA lockstep path (~0.5 Mrays/s); the paged packet kernel keeps
    them on the fast path (VERDICT r3 item 2)."""
    from examples.render_crowd import build_crowd_scene

    scene, registry, rt, cam = build_crowd_scene(10000, 1024, 1024)
    dt = _time(lambda: rt.render(cam)[0], iters=3, warmup=1)
    rays = 1024 * 1024 * 2  # primary + 1 shadow wavefront
    return rays / dt / 1e6, dt * 1e3


def bench_config4():
    from examples.render_hybrid import build_hybrid_scene

    eng, hy, cam = build_hybrid_scene(1920, 1080)
    dt = _time(lambda: hy.render(cam)[0], iters=3, warmup=1)
    return dt * 1e3


def bench_config5():
    from examples.render_dynamic import build_dynamic_scene

    eng, rp, cam = build_dynamic_scene(100_000, 1920, 1080)
    dt = _time(lambda: rp.render(cam)[0], iters=3, warmup=1)
    return dt * 1e3


def main():
    _setup_cache()
    metrics = {}
    emitted = threading.Lock()

    def emit():
        # print-once guard: the watchdog and the normal end both land here
        if not emitted.acquire(blocking=False):
            return
        snap = {}
        for _ in range(5):     # copy: the main thread may still be mutating
            try:
                snap = dict(metrics)
                break
            except RuntimeError:
                continue
        fps = snap.get("config1_raster_fps_512")
        headline = fps if isinstance(fps, (int, float)) else 0.0
        print(
            json.dumps(
                {
                    "metric": "raster_fps_example_512",
                    "value": headline,
                    "unit": "frames/sec",
                    "vs_baseline": round(headline / BASELINE_FPS, 3),
                    "metrics": snap,
                }
            ),
            flush=True,
        )

    def _watchdog():
        try:
            metrics["watchdog"] = (
                f"error: deadline {BENCH_DEADLINE_S}s exceeded "
                "(hung TPU tunnel?) — partial metrics emitted")
            emit()
        finally:
            os._exit(2)   # the exit must happen even if emit() raises

    dog = threading.Timer(BENCH_DEADLINE_S, _watchdog)
    dog.daemon = True
    dog.start()

    def run(name, fn):
        try:
            metrics[name] = fn()
        except Exception as e:  # record, don't die
            metrics[name] = f"error: {type(e).__name__}: {e}"[:200]
        # isolation between configs: earlier configs' live executables +
        # device buffers (a 100k scene keeps multi-GiB pair tables) both
        # squeeze HBM and contend the compile service — a config-5 iter
        # measured 25 s inside the bench process vs 214 ms standalone
        import gc

        import jax

        gc.collect()
        jax.clear_caches()  # drops jit executables; persistent disk cache
        gc.collect()        # now frees the buffers the executables pinned

    run("config1_raster_fps_512", lambda: round(bench_config1(), 3))
    run("config2_raster_ms_10k_1080p", lambda: round(bench_config2(), 2))

    def c3():
        mrays, refit = bench_config3()
        metrics["config3_tlas_refit_ms"] = round(refit, 3)
        return round(mrays, 2)

    run("config3_primary_mrays_1080p", c3)
    run("config4_hybrid_ms_1080p", lambda: round(bench_config4(), 1))
    run("rt_full_frame_ms_1080p", lambda: round(bench_rt_full_frame(), 1))

    def crowd():
        mrays, ms = bench_rt_crowd_10k()
        metrics["rt_crowd_10k_frame_ms_1024"] = round(ms, 1)
        return round(mrays, 2)

    run("rt_crowd_10k_mrays_1024", crowd)
    run("config5_raster_ms_100k_1080p", lambda: round(bench_config5(), 1))

    dog.cancel()
    emit()


if __name__ == "__main__":
    main()
