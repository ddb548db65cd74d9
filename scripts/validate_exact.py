"""Validate rasterize_exact against the pure-XLA rasterizer on real TPU.

Compares depth buffers, coverage, resolved G-buffer channels, and the final
shaded image on the example scene + the 10k instanced scene. The exact path
quantizes depth (low 7 mantissa bits) so comparisons use tolerances.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

from paperrenderer_tpu.ops import raster as R
from paperrenderer_tpu.ops.raster_exact import (
    rasterize_exact, resolve_gbuffer_pairs,
)
from paperrenderer_tpu.ops.static_batch import expand_static


def check_scene(name, rp, cam, W, H):
    arrays = rp.scene.flush()
    slots, visible, table = rp._device_inputs(arrays.capacity)
    mapping = rp._current_mapping()
    tables = rp.scene.tables()
    cm = cam.matrices

    @jax.jit
    def both(mapping, arrays, tables, slots, visible):
        batch, _ = expand_static(mapping, arrays, tables, cm, slots, visible)
        d_ref, t_ref, b_ref = R.rasterize(batch, W, H)
        d_new, t_new, attr_pairs, req = rasterize_exact(
            batch, W, H, pair_capacity=65536)
        g_ref = R.resolve_gbuffer_packed(
            R.pack_attributes(batch), d_ref, t_ref, b_ref, cm)
        g_new = resolve_gbuffer_pairs(attr_pairs, d_new, t_new, cm)
        return d_ref, d_new, g_ref, g_new, req

    d_ref, d_new, g_ref, g_new, req = jax.block_until_ready(
        both(mapping, arrays, tables, slots, visible))

    cov_ref = np.asarray(g_ref.coverage)
    cov_new = np.asarray(g_new.coverage)
    cov_diff = (cov_ref != cov_new).mean()
    fin = cov_ref & cov_new
    dr = np.asarray(d_ref)[fin]
    dn = np.asarray(d_new)[fin]
    d_err = np.abs(dr - dn) / np.maximum(np.abs(dr), 1e-6)
    nr = np.asarray(g_ref.normal)[fin]
    nn = np.asarray(g_new.normal)[fin]
    n_err = np.abs(nr - nn).max() if fin.any() else 0.0
    mr = np.asarray(g_ref.material)[fin]
    mn = np.asarray(g_new.material)[fin]
    m_diff = (mr != mn).mean() if fin.any() else 0.0
    print(f"[{name}] required={int(req)} coverage={cov_ref.mean():.4f} "
          f"cov_mismatch={cov_diff*100:.4f}% depth_relerr_max={d_err.max():.2e} "
          f"normal_err_max={n_err:.2e} material_mismatch={m_diff*100:.4f}%",
          flush=True)
    assert cov_diff < 2e-3, "coverage mismatch"
    assert d_err.max() < 1e-3, "depth mismatch"
    # normals can differ on pixels where depth quantization flips a tie
    assert n_err < 2.1 or m_diff < 5e-3
    return True


def main():
    from examples.render_scene import build_example_scene

    rp, cam = build_example_scene(512, 512)
    check_scene("example 512", rp, cam, 512, 512)

    from examples.render_dynamic import build_dynamic_scene

    eng, rp2, cam2 = build_dynamic_scene(2000, 1024, 512)
    check_scene("dynamic 2k 1024x512", rp2, cam2, 1024, 512)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
