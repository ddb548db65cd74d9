"""Deferred PBR shading: Cook-Torrance point lights + ambient + emissive.

Reproduces the reference example's shading math exactly (so hybrid frames can
pixel-match): example/resources/shaders/pbr.glsl:53-136 —
  * Lambertian diffuse: max(N.L, 0) * baseColor
  * GGX NDF with a2 = roughness^2 (the reference's convention, pbr.glsl:61)
  * Schlick fresnel, pow5
  * Smith-Schlick geometry, k = (r+1)^2 / 8
  * windowed inverse-square attenuation: clamp(1-(d/bounds)^4)^2 / d^2
  * specular term scaled by N.L * 2 (pbr.glsl:130)
  * roughness clamped to [mix(0.001, 0, metallic), 1]

Everything operates on [..., 3] pixel arrays — one fused VPU pass over the
whole G-buffer, replacing the per-fragment loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.material import MaterialTable
from .raster import GBuffer


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Lights:
    """Point lights + ambient (example main.cpp:205-330, pbr.glsl:6-24)."""

    position: jax.Array     # f32[L, 3]
    color: jax.Array        # f32[L, 3]
    radius: jax.Array       # f32[L] — soft-shadow source radius
    bounds: jax.Array       # f32[L] — influence range
    cast_shadow: jax.Array  # bool[L]
    ambient: jax.Array      # f32[4] — rgb + strength (ambientLight uniform)
    # static mirror of cast_shadow: lets shadow_visibility SKIP the trace
    # wavefront for non-casting lights at trace time (the reference skips
    # the shadow ray query per light, raytrace.rchit; a dynamic bool[L]
    # can only mask the result AFTER paying the trace). None = unknown
    # (trace every light, mask dynamically).
    shadow_flags: tuple | None = dataclasses.field(
        metadata=dict(static=True), default=None)
    # static mirror of (radius == 0): a hard light's N shadow samples are
    # the IDENTICAL ray (sdir falls back to ldir), so one trace suffices
    # bit-exactly; None = unknown (trace every sample).
    hard_flags: tuple | None = dataclasses.field(
        metadata=dict(static=True), default=None)

    @staticmethod
    def make(points, ambient=(1.0, 1.0, 1.0, 0.1)) -> "Lights":
        """points: list of dicts with position/color/radius/bounds/cast_shadow."""
        n = max(1, len(points))
        pos = np.zeros((n, 3), np.float32)
        col = np.ones((n, 3), np.float32)
        rad = np.zeros((n,), np.float32)
        bnd = np.zeros((n,), np.float32)
        shd = np.zeros((n,), bool)
        for i, p in enumerate(points):
            pos[i] = p["position"]
            col[i] = p.get("color", (1, 1, 1))
            rad[i] = p.get("radius", 0.0)
            bnd[i] = p.get("bounds", 10.0)
            shd[i] = p.get("cast_shadow", True)
        return Lights(
            position=jnp.asarray(pos), color=jnp.asarray(col),
            radius=jnp.asarray(rad), bounds=jnp.asarray(bnd),
            cast_shadow=jnp.asarray(shd),
            ambient=jnp.asarray(ambient, jnp.float32),
            shadow_flags=tuple(bool(x) for x in shd),
            hard_flags=tuple(float(x) == 0.0 for x in rad),
        )

    def replace(self, **kw) -> "Lights":
        """Edit light fields, keeping the static mirrors consistent.

        ``dataclasses.replace(lights, cast_shadow=..., radius=...)`` would
        silently keep STALE ``shadow_flags``/``hard_flags`` — a dynamically
        enabled light would then never trace its shadow wavefront (the
        static flag gates the trace), and a softened light would keep
        tracing one sample. Use this instead for host-side edits; it
        re-derives the mirrors from the new array values (device sync)."""
        new = dataclasses.replace(self, **kw)
        if "cast_shadow" in kw or "radius" in kw:
            new = dataclasses.replace(
                new,
                shadow_flags=tuple(
                    bool(x) for x in np.asarray(new.cast_shadow)),
                hard_flags=tuple(
                    float(x) == 0.0 for x in np.asarray(new.radius)),
            )
        return new

    @property
    def count(self) -> int:
        return self.position.shape[0]


def _ggx_ndf(n_dot_h: jax.Array, roughness: jax.Array) -> jax.Array:
    a2 = roughness * roughness  # reference convention (pbr.glsl:61)
    d = (n_dot_h * n_dot_h) * (a2 - 1.0) + 1.0
    return a2 / (d * d)


def _schlick_fresnel(cos_theta: jax.Array, f0: jax.Array) -> jax.Array:
    return f0 + (1.0 - f0) * jnp.power(jnp.maximum(1.0 - cos_theta, 0.0), 5.0)


def _schlick_ggx(a_dot_b: jax.Array, roughness: jax.Array) -> jax.Array:
    k = (roughness + 1.0) ** 2 / 8.0
    ab = jnp.maximum(a_dot_b, 0.0)
    return ab / (ab * (1.0 - k) + k)


def leaf_alpha(uv: jax.Array) -> jax.Array:
    """Procedural leaf cutout (example leaf.glsl getAlpha): a lens-shaped
    region around v=0.5 whose half-width follows a parabola in u. Returns
    1.0 inside the leaf, 0.0 outside."""
    x = uv[..., 0]
    y = uv[..., 1] - 0.5
    curve = (-((1.0 - 2.0 * x) ** 2) + 1.0) * 0.2
    return jnp.where(jnp.abs(y) < curve, 1.0, 0.0)


def leaf_occlusion(uv: jax.Array) -> jax.Array:
    """example leaf.glsl getOcclusion: ao-ish gradient along the leaf."""
    return uv[..., 0] * 0.5 + 0.5


def _attenuate(dist: jax.Array, bounds: jax.Array) -> jax.Array:
    win = jnp.clip(1.0 - (dist / jnp.maximum(bounds, 1e-6)) ** 4, 0.0, 1.0) ** 2
    return win / jnp.maximum(dist * dist, 1e-4)


def point_light_contribution(
    normal: jax.Array,       # f32[..., 3]
    view_dir: jax.Array,     # f32[..., 3] (to camera)
    world_pos: jax.Array,    # f32[..., 3]
    albedo: jax.Array,       # f32[..., 3]
    roughness: jax.Array,    # f32[...]
    metallic: jax.Array,     # f32[...]
    light_pos: jax.Array,    # f32[3]
    light_color: jax.Array,  # f32[3]
    light_bounds: jax.Array,  # f32[]
) -> jax.Array:
    """One point light's radiance at each pixel — pbr.glsl calculatePointLight."""
    to_light = light_pos - world_pos
    dist = jnp.linalg.norm(to_light, axis=-1)
    l_dir = to_light / jnp.maximum(dist, 1e-9)[..., None]
    h = view_dir + l_dir
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9)

    r = jnp.clip(roughness, 0.001 * (1.0 - metallic), 1.0)
    f0 = 0.04 * (1.0 - metallic[..., None]) + albedo * metallic[..., None]
    v_dot_h = jnp.sum(view_dir * h, axis=-1)
    f = _schlick_fresnel(v_dot_h[..., None], f0)

    k_d = (1.0 - f) * (1.0 - metallic[..., None])
    n_dot_l = jnp.sum(normal * l_dir, axis=-1)
    diffuse = jnp.maximum(n_dot_l, 0.0)[..., None] * albedo

    n_dot_h = jnp.maximum(jnp.sum(normal * h, axis=-1), 0.0)
    d = _ggx_ndf(n_dot_h, r)
    g = _schlick_ggx(n_dot_l, r) * _schlick_ggx(jnp.sum(normal * view_dir, axis=-1), r)
    denom = jnp.maximum(
        4.0 * jnp.maximum(n_dot_l, 0.0) * jnp.maximum(jnp.sum(normal * view_dir, axis=-1), 0.0),
        1e-4,
    )
    specular = (d * g)[..., None] * f / denom[..., None]

    radiance = jnp.maximum(k_d * diffuse + specular * (n_dot_l * 2.0)[..., None], 0.0)
    atten = _attenuate(dist, light_bounds)
    in_bounds = (dist < light_bounds).astype(jnp.float32)
    return radiance * (atten * in_bounds)[..., None] * light_color


def lookup_material_params(materials: MaterialTable, ids: jax.Array):
    """(albedo, emissive, roughness, metallic) at ``ids`` — strategy picked
    by table size.

    m <= 32: unrolled select accumulation — fully fused elementwise VPU work.
    (A one-hot MATMUL pads the tiny m/3 dims to 128 on the MXU — measured
    34 ms of a 1080p shade for m=5 under the package's highest-precision
    default; per-element row gathers cost ~30 ns/row x 2M pixels = 60 ms;
    selects are ~2 ms.) m <= 128: one-hot matmul at DEFAULT (bf16) matmul
    precision — material values are artistic parameters, bf16 is fine and
    6x cheaper than the package-wide highest default. Larger: ONE packed
    row gather — (albedo, emissive, roughness, metallic) pack into 8 f32,
    so a [Mp//16, 128] view holds 16 materials per physical lane row and
    the fetch is one fully-used 512 B row per pixel + subrow selects
    (resolve_gbuffer_pairs' 4-row trick). Four separate jnp gathers cost
    ~38 ms of a 1080p config-2 shade (the two 1-D scalar gathers were
    14.8 ms EACH — xplane-measured); this path is ~4 ms."""
    m = materials.albedo.shape[0]
    if m <= 32:
        albedo = jnp.zeros(ids.shape + (3,), jnp.float32)
        emissive = jnp.zeros_like(albedo)
        roughness = jnp.zeros(ids.shape, jnp.float32)
        metallic = jnp.zeros_like(roughness)
        for i in range(m):
            sel = ids == i
            sel3 = sel[..., None]
            albedo = jnp.where(sel3, materials.albedo[i], albedo)
            emissive = jnp.where(sel3, materials.emissive[i], emissive)
            roughness = jnp.where(sel, materials.roughness[i], roughness)
            metallic = jnp.where(sel, materials.metallic[i], metallic)
        return albedo, emissive, roughness, metallic
    if m <= 128:
        onehot = jax.nn.one_hot(ids, m, dtype=jnp.float32)
        prec = jax.lax.Precision.DEFAULT
        albedo = jnp.matmul(onehot, materials.albedo, precision=prec)
        emissive = jnp.matmul(onehot, materials.emissive, precision=prec)
        scalars = jnp.matmul(
            onehot,
            jnp.stack([materials.roughness, materials.metallic], axis=-1),
            precision=prec,
        )
        return albedo, emissive, scalars[..., 0], scalars[..., 1]
    from .gather import gather_rows_packed

    packed = jnp.concatenate(
        [materials.albedo, materials.emissive,
         materials.roughness[:, None], materials.metallic[:, None]], axis=-1)
    row = gather_rows_packed(packed, jnp.maximum(ids, 0))  # [..., 8]
    return row[..., 0:3], row[..., 3:6], row[..., 6], row[..., 7]


def lookup_texture_ids(materials: MaterialTable, ids: jax.Array):
    """(base_tex, emissive_tex, mr_tex, occ_tex) at ``ids`` via ONE packed
    row lookup of the four i32 id tables (4 separate table lookups pay 4x
    the fetch/select work for 4 bytes each of useful data)."""
    from ..core.texture import select_rows

    packed = jnp.stack(
        [materials.base_tex, materials.emissive_tex,
         materials.mr_tex, materials.occ_tex], axis=-1)     # i32[M, 4]
    rows = select_rows(packed, ids)
    return rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3]


def shade_gbuffer(
    gbuf: GBuffer,
    materials: MaterialTable,
    lights: Lights,
    cam_pos: jax.Array,
    *,
    shadow_vis: jax.Array | None = None,  # f32[L, H, W] per-light visibility
    ambient_occlusion: jax.Array | None = None,  # f32[H, W]
    background: tuple = (0.0, 0.0, 0.0),
    textures=None,  # core.texture.TextureArrays | None
    mip_filter: str = "linear",  # "nearest" | "linear" | "aniso2"
) -> jax.Array:
    """Shade the G-buffer -> HDR image f32[H, W, 3].

    ``shadow_vis``/``ambient_occlusion`` slots let the RT passes feed their
    results into the same shading path (hybrid frames), replacing the
    reference's shadow-ray loop in raytrace.rchit:61-122. ``textures``
    enables baseColor/emissive texture sampling (mip level from image-space
    uv derivatives — the fragment-quad-derivative analogue).
    ``mip_filter`` selects nearest-mip bilinear, trilinear (default — the
    reference samplers use VK_SAMPLER_MIPMAP_MODE_LINEAR,
    VulkanResources.cpp:787-794), or 2-tap anisotropic + trilinear.
    """
    albedo, emissive, roughness, metallic = lookup_material_params(
        materials, gbuf.material)

    tex_occ = None
    if textures is not None:
        from ..core.texture import (
            sample_aniso2, sample_bilinear, sample_trilinear, select_rows,
            uv_screen_lod, uv_screen_lod_aniso,
        )

        base_tex, emis_tex, mr_tex, occ_tex = lookup_texture_ids(
            materials, gbuf.material)
        wh = select_rows(textures.rects[:, 0, 2:4],
                         jnp.clip(base_tex, 0, textures.count - 1))
        if mip_filter == "aniso2":
            lod, duv = uv_screen_lod_aniso(gbuf.uv, wh[..., 0], wh[..., 1])
            sample = lambda t, i: sample_aniso2(t, i, gbuf.uv, lod, duv)
        elif mip_filter == "linear":
            lod = uv_screen_lod(gbuf.uv, wh[..., 0], wh[..., 1])
            sample = lambda t, i: sample_trilinear(t, i, gbuf.uv, lod)
        else:
            lod = uv_screen_lod(gbuf.uv, wh[..., 0], wh[..., 1])
            sample = lambda t, i: sample_bilinear(t, i, gbuf.uv, lod)
        albedo = albedo * sample(textures, base_tex)[..., :3]
        emissive = emissive + jnp.where(
            (emis_tex >= 0)[..., None],
            sample(textures, emis_tex)[..., :3],
            0.0,
        )
        # glTF metallicRoughness: g = roughness factor, b = metallic factor
        mr = sample(textures, mr_tex)
        roughness = roughness * jnp.where(mr_tex >= 0, mr[..., 1], 1.0)
        metallic = metallic * jnp.where(mr_tex >= 0, mr[..., 2], 1.0)
        # glTF occlusion: r channel scales ambient/indirect light
        tex_occ = jnp.where(
            occ_tex >= 0,
            sample(textures, occ_tex)[..., 0], 1.0)

    view_dir = cam_pos - gbuf.world_pos
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-9
    )

    total = jnp.zeros_like(albedo)
    for i in range(lights.count):  # small static count — unrolled and fused
        contrib = point_light_contribution(
            gbuf.normal, view_dir, gbuf.world_pos,
            albedo, roughness, metallic,
            lights.position[i], lights.color[i], lights.bounds[i],
        )
        if shadow_vis is not None:
            contrib = contrib * shadow_vis[i][..., None]
        total = total + contrib

    ao = 1.0 if ambient_occlusion is None else ambient_occlusion[..., None]
    if tex_occ is not None:
        ao = ao * tex_occ[..., None]
    ambient = lights.ambient[:3] * lights.ambient[3] * albedo * ao
    total = total + ambient + emissive

    bg = jnp.asarray(background, jnp.float32)
    return jnp.where(gbuf.coverage[..., None], total, bg)
