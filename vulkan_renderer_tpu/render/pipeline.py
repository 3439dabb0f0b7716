"""The frame function: render(scene, camera, settings) -> image.

TPU-native equivalent of the reference's per-frame command buffer
(main.c:1395-1444: visibility subpass -> shading subpass) plus the constant
upload (write_constants, main.c:2114-2188). The whole frame is one pure
jitted function; RenderSettings and SceneStatic are static arguments, so
every settings change retraces — exactly like the reference recompiling its
shading shader with new #defines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.settings import ErrorDisplay, RenderSettings
from ..ops.noise import get_noise_pairs
from ..ops.srgb import linear_to_srgb, srgb_to_linear
from ..scene.camera import (FirstPersonCamera,
                            get_pixel_to_ray_direction_world_space)
from ..scene.scene import Scene
from .shading import (INVALID_PRIMITIVE, FrameConstants, SceneStatic,
                      error_to_color, evaluate_polygonal_light_shading,
                      get_ltc_coefficients, get_shading_data,
                      pairs_per_light)
from ..ops.intersect import polygonal_light_ray_intersection
from ..ops.math_utils import normalize
from .shading import get_polygon_radiance
from .line_shading import (evaluate_linear_light_shading,
                           linear_pairs_per_light)
from .bvh import make_bvh_closest_hit, make_bvh_occlusion
from .visibility import trace_anyhit_bruteforce, trace_primary_bruteforce
from .wavefront import trace_anyhit, trace_closest

from typing import NamedTuple


class FrameStats(NamedTuple):
    """Exactness counters from the wavefront tracer (0 in healthy runs).

    primary_uncertain: primary rays whose closest hit lacks the front-to-
    back exactness guarantee (cluster budget too small for this view).
    shadow_overflow: shadow ray/cluster pairs dropped by the any-hit
    budget — a nonzero value means some shadows may be missing."""
    primary_uncertain: jnp.ndarray  # () int32
    shadow_overflow: jnp.ndarray    # () int32


def make_frame_constants(camera: FirstPersonCamera, width: int, height: int,
                         settings: RenderSettings,
                         noise_random_numbers) -> FrameConstants:
    return FrameConstants(
        camera_position=jnp.asarray(camera.position_world_space, jnp.float32),
        pixel_to_ray=jnp.asarray(
            get_pixel_to_ray_direction_world_space(camera, width, height)),
        exposure_factor=jnp.float32(settings.exposure_factor),
        roughness_factor=jnp.float32(settings.roughness_factor),
        mis_visibility_estimate=jnp.float32(settings.mis_visibility_estimate),
        error_factor=jnp.float32(10.0 ** (-settings.error_min_exponent)),
        noise_random_numbers=jnp.asarray(noise_random_numbers, jnp.uint32),
    )


def _cluster_compaction_budget(scene: Scene) -> int:
    """Per-row-chunk distinct-cluster budget for the CPU wavefront
    tracers: the flat default (384) silently under-covered the
    bistro-class stand-in (846 clusters -> 1535 primary rays flagged
    uncertain per 640x360 frame; measured: full coverage at 846 brings
    it to 0 even at pairs_per_ray=64). Track the scene's cluster count,
    capped so city-scale scenes (~4.7k clusters) keep a bounded
    compacted-planes working set."""
    return min(max(384, int(scene.clusters.cluster_count)), 4096)


def _pixel_preamble(scene: Scene, static: SceneStatic,
                    settings: RenderSettings, constants: FrameConstants,
                    primitive_index, ray_direction, geom=None,
                    position=None):
    """Per-pixel work shared by the fused and vmapped shading paths:
    shading-data reconstruction, light display, LTC fetch. geom/position
    short-circuit the geometry half when the Pallas attribute-fetch kernel
    already produced them (trace_kernel.trace_closest_attrs)."""
    hit = primitive_index != INVALID_PRIMITIVE
    safe_prim = jnp.where(hit, primitive_index, 0).astype(jnp.int32)

    if geom is None:
        from .shading import geometry_attributes
        geom, position = geometry_attributes(scene, constants, safe_prim,
                                             ray_direction)
    from .shading import finish_shading_data
    data = finish_shading_data(scene, constants, constants.roughness_factor,
                               geom, position,
                               max_anisotropy=static.max_anisotropy)

    base = jnp.zeros(3)
    view_dir = normalize(ray_direction)
    if settings.show_polygonal_lights:
        # Display the light sources themselves (glsl:841-850).
        ray_end = jnp.where(
            hit,
            jnp.concatenate([data.position, jnp.ones(1)]),
            jnp.concatenate([ray_direction, jnp.zeros(1)]))
        for i in range(static.light_count):
            light_hit = polygonal_light_ray_intersection(
                scene.lights.plane[i], scene.lights.vertices_world_space[i],
                scene.lights.vertex_count[i].astype(jnp.int32),
                constants.camera_position, ray_end)
            radiance = get_polygon_radiance(
                scene, i, static.light_texturing[i], view_dir,
                constants.camera_position)
            base = base + jnp.where(light_hit, radiance, 0.0)

    fresnel_luminance = jnp.sum(
        data.fresnel_0 * jnp.array([0.2126, 0.7152, 0.0722]))
    ltc = get_ltc_coefficients(scene.ltc, fresnel_luminance, data.roughness,
                               data.position, data.normal, data.outgoing)
    return hit, data, ltc, base


def _shade_pixel(scene: Scene, static: SceneStatic, settings: RenderSettings,
                 constants: FrameConstants,
                 pixel_xy, primitive_index, ray_direction, noise_pairs,
                 geom=None, position=None):
    """Per-pixel shading EXCEPT shadow visibility (deferred): returns
    (base (3,), b (S,3), ray_dirs (S,3), t_max (S,), origin (3,)).
    Final color = postprocess((base + sum b_i * V_i) * exposure)."""
    hit, data, ltc, base = _pixel_preamble(scene, static, settings,
                                           constants, primitive_index,
                                           ray_direction, geom, position)
    ppl = pairs_per_light(settings)
    b_all, dir_all, tmax_all = [], [], []
    for i in range(static.light_count):
        light_pairs = noise_pairs[i * ppl:(i + 1) * ppl]
        result = evaluate_polygonal_light_shading(
            scene, static, settings, constants, i, data, ltc, light_pairs)
        base = base + jnp.where(hit, result.base, 0.0)
        b_all.append(jnp.where(hit, result.b, 0.0))
        dir_all.append(result.ray_dirs)
        tmax_all.append(result.t_max)
    lppl = linear_pairs_per_light(settings)
    offset = static.light_count * ppl
    for i in range(static.linear_light_count):
        light_pairs = noise_pairs[offset + i * lppl:offset + (i + 1) * lppl]
        lbase, lb, ldirs, ltmax = evaluate_linear_light_shading(
            scene, settings, i, data, ltc, light_pairs)
        base = base + jnp.where(hit, lbase, 0.0)
        b_all.append(jnp.where(hit, lb, 0.0))
        dir_all.append(ldirs)
        tmax_all.append(ltmax)
    b = jnp.concatenate(b_all, axis=0)
    dirs = jnp.concatenate(dir_all, axis=0)
    tmax = jnp.concatenate(tmax_all, axis=0)
    origin = jnp.where(hit, data.position, constants.camera_position)
    return base, b, dirs, tmax, origin


def _use_fused(static: SceneStatic, settings: RenderSettings) -> bool:
    """Fused Pallas shading kernel dispatch (render/fused.py). "auto"
    uses it whenever the configuration is supported (on CPU the kernel
    runs interpreted — slow but correct, mainly for tests)."""
    if static.fused == "off":
        return False
    from .fused import fused_supported
    if not fused_supported(static, settings):
        if static.fused == "on":
            raise ValueError(
                "static.fused='on' but this configuration has no fused "
                "kernel (see render/fused.py fused_supported)")
        return False
    if static.fused == "on":
        return True
    # The driver's TPU platform is named "axon" (tunneled v5e); only the
    # CPU backend lacks a compiled Pallas path.
    import jax as _jax
    return _jax.default_backend() != "cpu"


def _postprocess(color, settings: RenderSettings):
    """Exposure already applied; handle HDR-bit frames and sRGB
    (glsl:867-893). color: (..., 3) linear."""
    if settings.frame_bits > 0:
        # Pack half-float bytes into LDR channels for 2-frame HDR capture.
        # (The reference additionally counter-converts sRGB when the
        # swapchain applies a hardware linear->sRGB step,
        # shading_pass.frag.glsl:884-889; our framebuffer is raw floats, so
        # the bytes are emitted untouched.)
        half_bits = jax.lax.bitcast_convert_type(
            color.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
        if settings.frame_bits == 1:
            bytes_ = half_bits & 0xFF
        else:
            bytes_ = (half_bits & 0xFF00) >> 8
        return bytes_.astype(jnp.float32) / 255.0
    if not settings.output_linear_rgb:
        return linear_to_srgb(color)
    return color


@functools.partial(jax.jit, static_argnames=("static", "settings", "width",
                                             "height", "with_stats",
                                             "stop_after"))
def render_frame_jit(scene: Scene, static: SceneStatic,
                     settings: RenderSettings, constants: FrameConstants,
                     width: int, height: int, with_stats: bool = False,
                     stop_after: str | None = None, row_offset=None):
    """Render one frame: (H, W, 3) float32 in output color space.
    With with_stats=True returns (image, FrameStats) so callers can check
    the tracer's exactness counters instead of silently trusting budgets.

    Structure: visibility (rays -> primitive ids), per-pixel shading with
    deferred shadow-ray collection, ONE batched wavefront/BVH shadow trace
    over the whole frame's ray megabatch (the north-star design), then
    visibility-weighted resolve + postprocess.

    All matmuls run at HIGHEST precision: the TPU default lowers f32
    matmuls to bf16 MXU passes, which rounds the per-pixel 3x3 frame
    transforms by ~1e-3 relative — visibly diverging from the fused
    kernel's exact-f32 VPU arithmetic and breaking the RMSE<1e-3 parity
    budget."""
    with jax.default_matmul_precision("highest"):
        return _render_frame_body(scene, static, settings, constants,
                                  width, height, with_stats, stop_after,
                                  row_offset)


def _pack_geom_planes(geom, position_unused=None):
    """Inverse of shading.geometry_attributes_from_planes: one (18,) row
    in the attribute-kernel layout (found = 1)."""
    return jnp.concatenate([
        geom.normal_interp, geom.tex_coord, geom.duv_dx, geom.duv_dy,
        geom.tangent, geom.bitangent,
        jnp.stack([geom.mean_tangent_length,
                   geom.material_index.astype(jnp.float32),
                   jnp.float32(1.0)])])


def _fixup_stale_attrs(scene, constants, attr_planes, stale, prim, ray_dirs):
    """Recompute attributes for rays whose re-traced primitive is not
    covered by the attribute kernel's first-pass output: a small compacted
    shading_rows gather under lax.cond (free when the re-trace changed
    nothing). Returns (attr_planes, residual) — residual counts stale rays
    beyond the fixup capacity (surfaced in primary_uncertain)."""
    from .trace_kernel import _compact_indices
    from .shading import geometry_attributes
    r = stale.shape[0]
    cap = min(r, max(128, r // 32))

    def fix(_):
        idx, count = _compact_indices(stale, cap)
        live = jnp.arange(cap, dtype=jnp.int32) < count
        safe_p = jnp.where(live, prim[idx], 0).astype(jnp.int32)
        geom, _ = jax.vmap(functools.partial(geometry_attributes, scene,
                                             constants))(
            safe_p, ray_dirs[idx])
        rows = jax.vmap(_pack_geom_planes)(geom)
        scatter_idx = jnp.where(live, idx, jnp.int32(r))
        out = attr_planes.at[scatter_idx].set(rows, mode="drop")
        residual = jnp.sum(stale, dtype=jnp.int32) - count
        return out, residual

    def skip(_):
        return attr_planes, jnp.int32(0)

    return jax.lax.cond(jnp.any(stale), fix, skip, None)


def _stage_stub(width, height, with_stats, *tensors):
    """Early-exit image for stop_after profiling: depends on every stage
    output so XLA cannot dead-code the measured work."""
    acc = jnp.float32(0.0)
    for t in tensors:
        acc = acc + jnp.sum(t.astype(jnp.float32))
    image = jnp.full((height, width, 3), 0.0) + acc * 1e-30
    if with_stats:
        return image, FrameStats(jnp.int32(0), jnp.int32(0))
    return image


def _render_frame_body(scene, static, settings, constants, width, height,
                       with_stats, stop_after=None, row_offset=None):
    """row_offset: traced GLOBAL row index of this image band's first row
    (image-band sharding, parallel/tiles.py render_frame_shardmap): pixel
    y coordinates are global so ray directions and noise fetches match the
    single-chip frame exactly; `height` is the band height."""
    traversal = static.resolved_traversal(
        int(scene.triangle_positions.shape[0]))
    # "pallas" forces the Pallas tracer even on CPU (interpret mode, for
    # tests of the pipeline wiring incl. the Morton permutation).
    trace_interpret = jax.default_backend() == "cpu"
    use_pallas_trace = traversal == "pallas" \
        or (traversal == "wavefront" and not trace_interpret)

    # The WHOLE frame runs in a trace-friendly pixel order: each trace
    # chunk is then a compact pixel tile instead of a row scan strip (far
    # tighter per-chunk cluster unions — this holds for the XLA wavefront
    # tracer's 16384-ray chunks just as for the Pallas chunks).
    #
    # Preferred order: 64 x (2*chunk_rows) TILES in row-major tile order,
    # pixels row-major inside (one tile == one Pallas trace chunk). Tile
    # order is a pure reshape/transpose on device — Morton order needs a
    # PERMUTATION GATHER, and at 518k rows each of (pixels in, noise in,
    # colors out) cost ~37 ms on v5e (~110 ms/frame of pure reordering).
    # Non-64-multiple widths (tiny test frames) fall back to Morton.
    morton_order = use_pallas_trace or traversal == "wavefront"
    tile_h = max(2 * static.trace_chunk_rows, 1)
    tiled = morton_order and width % 64 == 0 and height > tile_h
    render_h = height
    inv_perm = None
    chunk_rects = None
    if tiled:
        if static.primary_raster:
            # Static per-chunk pixel rects (one chunk == one tile_h x 64
            # tile; bounds are inclusive pixel-center coordinates).
            ty0, tx0 = -(-height // tile_h), width // 64
            ti = np.repeat(np.arange(ty0), tx0).astype(np.float32)
            tj = np.tile(np.arange(tx0), ty0).astype(np.float32)
            chunk_rects = jnp.asarray(np.stack(
                [tj * 64, ti * tile_h, tj * 64 + 63,
                 ti * tile_h + tile_h - 1], axis=1))
            if row_offset is not None:
                off = jnp.asarray(row_offset, jnp.float32)
                chunk_rects = chunk_rects + jnp.stack(
                    [jnp.float32(0.0), off, jnp.float32(0.0), off])
        render_h = -(-height // tile_h) * tile_h  # pad rows, crop at end
        ty, tx = render_h // tile_h, width // 64
        yy, xx = np.meshgrid(np.arange(render_h, dtype=np.float32),
                             np.arange(width, dtype=np.float32),
                             indexing="ij")
        coords = np.stack([xx, yy], -1).reshape(ty, tile_h, tx, 64, 2) \
            .transpose(0, 2, 1, 3, 4).reshape(-1, 2)
        pixels_f = jnp.asarray(coords)  # baked constant, no device gather
        if row_offset is not None:
            pixels_f = pixels_f + jnp.stack(
                [jnp.float32(0.0), jnp.asarray(row_offset, jnp.float32)])
    else:
        xs = jnp.arange(width, dtype=jnp.float32)
        ys = jnp.arange(height, dtype=jnp.float32)
        if row_offset is not None:
            ys = ys + jnp.asarray(row_offset, jnp.float32)
        px, py = jnp.meshgrid(xs, ys, indexing="xy")
        pixels_f = jnp.stack([px, py], axis=-1).reshape(-1, 2)
        if morton_order:
            from .trace_kernel import morton_pixel_permutation
            perm_np, inv_np = morton_pixel_permutation(width, height)
            pixels_f = pixels_f[jnp.asarray(perm_np)]
            inv_perm = jnp.asarray(inv_np)
            if static.primary_raster:
                # Per-chunk rects from the static Morton order (partial
                # final chunk included; bounds in pixel centers).
                chunk = static.trace_chunk_rows * 128
                pxy = np.stack([perm_np % width, perm_np // width],
                               axis=1).astype(np.float32)
                nc0 = -(-pxy.shape[0] // chunk)
                pad0 = nc0 * chunk - pxy.shape[0]
                if pad0:
                    pxy = np.concatenate(
                        [pxy, np.repeat(pxy[-1:], pad0, axis=0)])
                pxy = pxy.reshape(nc0, chunk, 2)
                rects_np = np.concatenate(
                    [pxy.min(axis=1), pxy.max(axis=1)], axis=1)
                if row_offset is not None:
                    off = jnp.asarray(row_offset, jnp.float32)
                    chunk_rects = jnp.asarray(rects_np) + jnp.stack(
                        [jnp.float32(0.0), off, jnp.float32(0.0), off])
                else:
                    chunk_rects = jnp.asarray(rects_np)
    pixels_i = pixels_f.astype(jnp.int32)
    # Integer pixel -> ray dir via the pixel_to_ray matrix (glsl:833).
    ray_dirs = (jnp.concatenate([pixels_f, jnp.ones_like(pixels_f[:, :1])],
                                axis=-1) @ constants.pixel_to_ray.T)

    if stop_after == "rays":
        return _stage_stub(width, height, with_stats, ray_dirs)
    primary_uncertain = jnp.int32(0)
    shadow_overflow = jnp.int32(0)
    geom_attrs = None
    attr_position = None
    if use_pallas_trace:
        from .trace_kernel import (cluster_screen_rects, trace_anyhit_fused,
                                   trace_closest_attrs, trace_closest_fused)
        raster = None
        if static.primary_raster and chunk_rects is not None:
            raster = (cluster_screen_rects(scene.clusters,
                                           constants.pixel_to_ray,
                                           constants.camera_position),
                      chunk_rects)
        if scene.clusters.attrs is not None:
            # Closest hit + in-kernel attribute fetch: replaces the
            # per-pixel shading_rows gather + vmapped re-intersection
            # (the round-2 preamble bottleneck, VERDICT r2 #1).
            primitive_index, t_hit, primary_uncertain, attr_planes, stale \
                = trace_closest_attrs(
                    scene.clusters,
                    jnp.broadcast_to(constants.camera_position,
                                     ray_dirs.shape),
                    ray_dirs, constants.pixel_to_ray[:, :2].T,
                    chunk_rows=static.trace_chunk_rows,
                    m_budget=static.primary_m_budget,
                    sc_budget=static.primary_sc_budget,
                    interpret=trace_interpret,
                    retrace_factor=static.retrace_factor,
                    retrace_frac=static.retrace_closest_frac,
                    seed_sc=static.seed_closest_sc,
                    seed_items=static.seed_items,
                    attr_filter=static.attr_item_filter,
                    attr_avg_items=static.attr_avg_items,
                    raster=raster)
            attr_planes, fix_residual = _fixup_stale_attrs(
                scene, constants, attr_planes, stale, primitive_index,
                ray_dirs)
            primary_uncertain = primary_uncertain + fix_residual
            hit0 = primitive_index != INVALID_PRIMITIVE
            t_safe = jnp.where(hit0 & jnp.isfinite(t_hit), t_hit, 0.0)
            attr_position = constants.camera_position \
                + t_safe[:, None] * ray_dirs
            from .shading import geometry_attributes_from_planes
            geom_attrs = jax.vmap(geometry_attributes_from_planes)(
                attr_planes)
        else:
            primitive_index, _, primary_uncertain = trace_closest_fused(
                scene.clusters,
                jnp.broadcast_to(constants.camera_position, ray_dirs.shape),
                ray_dirs, chunk_rows=static.trace_chunk_rows,
                m_budget=static.primary_m_budget,
                sc_budget=static.primary_sc_budget,
                interpret=trace_interpret,
                retrace_factor=static.retrace_factor,
                retrace_frac=static.retrace_closest_frac,
                seed_sc=static.seed_closest_sc,
                seed_items=static.seed_items,
                raster=raster)
    elif traversal == "wavefront":
        primitive_index, _, primary_uncertain = trace_closest(
            scene.clusters, constants.camera_position, ray_dirs,
            pairs_per_ray=static.primary_pairs_per_ray,
            chunk_cluster_budget=_cluster_compaction_budget(scene))
    elif traversal == "bvh":
        if scene.bvh is None:
            raise ValueError("traversal='bvh' needs build_scene("
                             "with_bvh=True); the default scene skips the "
                             "BVH build (clusters are the production path)")
        closest = make_bvh_closest_hit(scene.bvh)
        primitive_index, _ = jax.vmap(
            lambda d: closest(constants.camera_position, d))(ray_dirs)
    else:
        primitive_index, _ = trace_primary_bruteforce(
            scene.triangle_positions, constants.camera_position, ray_dirs)

    if stop_after == "trace":
        return _stage_stub(width, height, with_stats, primitive_index)
    ppl = pairs_per_light(settings)
    total_pairs = max(ppl * static.light_count
                      + linear_pairs_per_light(settings)
                      * static.linear_light_count, 1)
    if morton_order:
        # Image-form fetch: the scrambled offsets/layer are per-frame
        # scalars, so the noise is a dense roll+tile of the table plus ONE
        # reorder — a free reshape/transpose in tile order, a permutation
        # gather in the Morton fallback (ops/noise.py get_noise_image).
        from ..ops.noise import get_noise_image
        noise_img = get_noise_image(
            scene.noise_table, width, render_h, total_pairs,
            scene.noise_texture_index_mask,
            constants.noise_random_numbers,
            row_offset=row_offset)
        if tiled:
            noise_pairs = noise_img.reshape(
                ty, tile_h, tx, 64, total_pairs, 2) \
                .transpose(0, 2, 1, 3, 4, 5) \
                .reshape(-1, total_pairs, 2)
        else:
            noise_pairs = noise_img[jnp.asarray(perm_np)]
    else:
        noise_pairs = get_noise_pairs(
            scene.noise_table, pixels_i, total_pairs,
            scene.noise_resolution_mask, scene.noise_texture_index_mask,
            constants.noise_random_numbers)

    if stop_after == "noise":
        return _stage_stub(width, height, with_stats, primitive_index,
                           noise_pairs)
    if _use_fused(static, settings):
        from .fused import (_pack_light_scalars, fused_light_shading,
                            fused_light_shading_resolved,
                            fused_resolved_supported)
        preamble = functools.partial(_pixel_preamble, scene, static,
                                     settings, constants)
        if geom_attrs is not None:
            hit, data, ltc, base0 = jax.vmap(preamble)(
                primitive_index, ray_dirs, geom_attrs, attr_position)
        else:
            hit, data, ltc, base0 = jax.vmap(preamble)(primitive_index,
                                                       ray_dirs)
        if stop_after == "preamble":
            import jax as _jax
            return _stage_stub(width, height, with_stats, base0,
                               *_jax.tree.leaves((data, ltc)))
        light_scalars = _pack_light_scalars(scene.lights,
                                            static.light_count)
        if fused_resolved_supported(static, settings):
            # No shadow rays: every slot's visibility is 1, so the kernel
            # accumulates color in-register (no per-ray slot export) and
            # iterates lights as a grid dimension.
            base_l = fused_light_shading_resolved(
                data, ltc, hit, noise_pairs, light_scalars,
                constants.mis_visibility_estimate, static, settings,
                interpret=jax.default_backend() == "cpu")
            npx = base_l.shape[0]
            b = jnp.zeros((npx, 0, 3))
            dirs = jnp.zeros((npx, 0, 3))
            tmax = jnp.zeros((npx, 0))
        else:
            base_l, b, dirs, tmax = fused_light_shading(
                data, ltc, hit, noise_pairs, light_scalars,
                constants.mis_visibility_estimate, static, settings,
                interpret=jax.default_backend() == "cpu")
        base = base0 + base_l
        origins = jnp.where(hit[:, None], data.position,
                            constants.camera_position)
    else:
        shade = functools.partial(_shade_pixel, scene, static, settings,
                                  constants)
        if geom_attrs is not None:
            base, b, dirs, tmax, origins = jax.vmap(shade)(
                pixels_i, primitive_index, ray_dirs, noise_pairs,
                geom_attrs, attr_position)
        else:
            base, b, dirs, tmax, origins = jax.vmap(shade)(
                pixels_i, primitive_index, ray_dirs, noise_pairs)

    if stop_after == "shade":
        return _stage_stub(width, height, with_stats, base, b, dirs, tmax,
                           origins)
    if settings.trace_shadow_rays:
        s = b.shape[1]
        p = b.shape[0]
        # Sample-major megabatch layout: all pixels' rays for sample slot 0
        # (light 0), then slot 1, ... — rays within a wavefront row chunk
        # then share one light and a contiguous image region (a compact
        # Morton tile on the Pallas path), which keeps each chunk's
        # cluster union small.
        flat_origins = jnp.tile(origins, (s, 1))
        flat_dirs = dirs.transpose(1, 0, 2).reshape(-1, 3)
        flat_tmax = tmax.T.reshape(-1)
        # Rays with zero weight cannot contribute; collapse their range so
        # the cull rejects them immediately.
        live = jnp.any(b.transpose(1, 0, 2).reshape(-1, 3) != 0.0,
                       axis=-1)
        flat_tmax = jnp.where(live, flat_tmax, -1.0)
        if stop_after == "shadowrays":
            return _stage_stub(width, height, with_stats, base, b,
                               flat_origins, flat_dirs, flat_tmax)
        if use_pallas_trace:
            occluded, shadow_overflow = trace_anyhit_fused(
                scene.clusters, flat_origins, flat_dirs, flat_tmax,
                chunk_rows=(static.shadow_chunk_rows
                            or static.trace_chunk_rows),
                m_budget=static.shadow_m_budget,
                sc_budget=static.resolved_shadow_sc(
                    int(scene.clusters.cluster_count)),
                interpret=trace_interpret,
                retrace_factor=static.retrace_factor,
                retrace_frac=static.retrace_shadow_frac,
                retrace_mid_sc=static.retrace_mid_sc,
                seed_sc=static.seed_shadow_sc,
                seed_items=static.seed_items)
        elif traversal == "wavefront":
            occluded, shadow_overflow = trace_anyhit(
                scene.clusters, flat_origins, flat_dirs, flat_tmax,
                pairs_per_ray=static.shadow_pairs_per_ray,
                chunk_cluster_budget=_cluster_compaction_budget(scene))
        elif traversal == "bvh":
            occl = make_bvh_occlusion(scene.bvh)
            occluded = jax.vmap(occl)(flat_origins, flat_dirs, flat_tmax)
        else:
            occluded = trace_anyhit_bruteforce(
                scene.triangle_positions, flat_origins, flat_dirs, flat_tmax)
        visibility = jnp.where(occluded, 0.0, 1.0).reshape(s, p).T
    else:
        visibility = jnp.ones(b.shape[:2])
    if stop_after == "shadow":
        return _stage_stub(width, height, with_stats, base, b, visibility)

    colors = base + jnp.sum(b * visibility[:, :, None], axis=1)
    # NaN/Inf -> pink (glsl:861-864), then exposure.
    bad = jnp.any(jnp.isnan(colors) | jnp.isinf(colors), axis=-1,
                  keepdims=True)
    colors = jnp.where(bad, jnp.asarray([1.0, 0.0, 0.8]) /
                       constants.exposure_factor, colors)
    colors = colors * constants.exposure_factor
    colors = _postprocess(colors, settings)
    if tiled:
        # Tile order -> row-major: a reshape/transpose, then crop the
        # padded rows.
        image = colors.reshape(ty, tx, tile_h, 64, 3) \
            .transpose(0, 2, 1, 3, 4).reshape(render_h, width, 3)[:height]
    else:
        if morton_order:
            colors = colors[inv_perm]  # Morton order -> row-major image
        image = colors.reshape(height, width, 3)
    if with_stats:
        return image, FrameStats(primary_uncertain, shadow_overflow)
    return image


def render_frame(scene: Scene, static: SceneStatic, camera: FirstPersonCamera,
                 settings: RenderSettings, width: int, height: int,
                 noise_random_numbers=None):
    """Convenience host-side wrapper building constants then jit-rendering."""
    if noise_random_numbers is None:
        noise_random_numbers = (np.arange(4) * 0x123456).astype(np.uint32)
    constants = make_frame_constants(camera, width, height, settings,
                                     noise_random_numbers)
    return render_frame_jit(scene, static, settings, constants, width, height)
