"""The deferred shading pass: per-pixel reconstruction + polygonal-light
Monte Carlo shading with all sampling strategies and MIS heuristics.

TPU-native re-implementation of src/shaders/shading_pass.frag.glsl. Design
mapping:
- The reference's 39 compile-time #defines become static Python arguments
  (RenderSettings + SceneStatic) -> jit specialization.
- Per-fragment scalar code becomes an unbatched per-pixel function vmapped
  over all pixels; XLA maps the lanes onto the VPU.
- The preprocessor-unrolled light/sample loops (unrolling.glsl) become
  static Python loops over (light, sample) with a precomputed noise-pair
  schedule; on TPU there is no ray-query instruction to unroll around.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import MAX_POLYGON_VERTEX_COUNT as MAXV
from ..core.settings import (ErrorDisplay, MisHeuristic,
                             PolygonSamplingTechnique, RenderSettings,
                             SamplingStrategy)
from ..ops import sampling
from ..ops import sampling_arvo_psa as arvo_psa
from ..ops import sampling_related
from ..ops.brdf import (ShadingData, evaluate_brdf,
                        ggx_reflected_direction_density,
                        sample_ggx_reflected_direction)
from ..ops.clipping import clip_polygon
from ..ops.intersect import (polygonal_light_ray_intersection,
                             ray_triangle_barycentrics)
from ..ops.ltc import (LtcCoefficients, evaluate_ltc_density,
                       get_ltc_coefficients)
from ..ops.math_utils import F32, M_INV_PI, M_PI, normalize, pick_lane
from ..ops.mis import mis_estimate, mis_weight_over_density
from ..ops.srgb import linear_to_srgb, srgb_to_linear
from .texture import sample_texture_grad, sample_texture_lod0

INVALID_PRIMITIVE = jnp.uint32(0xFFFFFFFF)

# Occlusion test signature: (origin (3,), dir (3,), t_max ()) -> bool hit.
OcclusionFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SceneStatic:
    """Static (trace-time) scene facts, like the reference's scene-dependent
    defines (MATERIAL_COUNT, POLYGONAL_LIGHT_COUNT, ...)."""
    light_count: int
    light_texturing: tuple  # per light: PolygonTexturing int
    linear_light_count: int = 0
    max_light_vertex_count: int = MAXV - 1
    # Per-light vertex counts as STATIC ints: enables the fused Pallas
    # shading kernel (render/fused.py), mirroring the reference's
    # MIN/MAX_POLYGON_VERTEX_COUNT shader defines (main.c:763-772).
    # None -> fused path disabled, vmapped per-pixel path used.
    light_vertex_counts: tuple | None = None
    # Fused-kernel policy: "auto" (use on TPU when supported), "on", "off".
    fused: str = "auto"
    # Traversal backend: "auto" resolves to wavefront for large scenes and
    # brute force for small ones; "wavefront"/"bvh"/"bruteforce" force a
    # specific path (static -> jit specialization).
    traversal: str = "auto"
    # Wavefront cluster budgets (clusters tested per ray). Primary rays use
    # nearest-first culling with an exactness bound; shadow rays use
    # index-order any-hit. Render-time `uncertain`/overflow counters tell
    # when these are too small for a scene.
    primary_pairs_per_ray: int = 24
    shadow_pairs_per_ray: int = 24
    # Pallas traversal (render/trace_kernel.py, TPU only): rays per chunk
    # (x128) sharing one chunk-union work-item list. *_m_budget is the
    # AVERAGE per-chunk item capacity (global cap = chunks x budget): it
    # bounds SMEM/grid size, not per-chunk coverage — a chunk may use many
    # items while its neighbors use few. Overflow/uncertain counters
    # report rays left unproven by dropped superclusters or a capacity
    # overflow.
    trace_chunk_rows: int = 16
    # Shadow megabatch chunk rows (None = trace_chunk_rows). The shadow
    # cull cost scales with chunk count while wider chunks loosen unions;
    # the trade differs from primary rays, so it gets its own knob.
    shadow_chunk_rows: int | None = None
    primary_m_budget: int = 64
    shadow_m_budget: int = 48
    # Supercluster cull budgets (two-level cull tier; the ONLY remaining
    # per-chunk truncation — dropped superclusters produce per-ray
    # exactness bounds that trigger the re-trace). shadow_sc_budget None =
    # AUTO: sized from the scene's supercluster count at trace time
    # (resolved_shadow_sc) so arbitrary scenes run exact without hand
    # flags (VERDICT r4 #7) — ~10% coverage keeps the pass-1 unproven
    # rate ~1-2% across city sizes (measured: 16/147 at 300k tris and
    # 48/489 at 1M both run exact; a flat 16 at 1M left ~650k shadow
    # rays unproven and the re-trace capacity could not absorb them).
    primary_sc_budget: int = 32
    shadow_sc_budget: int | None = None
    # Exactness re-trace: rays left unproven by the budgets above are
    # compacted (order-preserving) and re-traced EXHAUSTIVELY — all
    # superclusters, item capacity scaled by this factor (lax.cond-gated,
    # free when the first pass is exact). 1 disables — counters then
    # report first-pass overflow as in round 2.
    retrace_factor: int = 2
    # Re-trace ray capacity = megabatch_rays // frac (min 2048). The
    # re-trace pays its dense exhaustive cull on ALL capacity slots, so
    # oversizing it is pure cost: the flagship shadow megabatch leaves
    # ~1% of rays unproven (frac 32 = 3x headroom); primary closest runs
    # ~0.2% (frac 64). Rays beyond the capacity stay unproven and show up
    # in the overflow/uncertain counters — the bench exactness gate fails
    # hard on them, so a too-aggressive frac is loud, never silent.
    retrace_shadow_frac: int = 32
    retrace_closest_frac: int = 64
    # Escalating shadow re-trace: when set, the compacted rays first
    # re-trace with this supercluster budget; only the remainder runs
    # the exhaustive pass at 1/8 ray capacity (trace_kernel.py
    # trace_anyhit_fused). None = single exhaustive tier.
    retrace_mid_sc: int | None = None
    # Occlusion seed passes (trace_kernel.py _closest_seed / the any-hit
    # seed): a cheap pass over only the N nearest superclusters runs
    # first; its hits bound the main cull's per-ray t_max (closest) or
    # deaden already-occluded rays (any-hit), shrinking the main pass's
    # work-item unions — the TPU analogue of front-to-back BVH early-out.
    # Exactness is untouched (seed hits are real intersections; its
    # unproven set is ignored). None = off.
    seed_closest_sc: int | None = None
    seed_shadow_sc: int | None = None
    seed_items: int = 24
    # Rasterizer-style primary visibility binning (VERDICT r4 #2; the
    # reference gets primary visibility from its rasterizer subpass,
    # main.c:429-584): cluster AABBs are PROJECTED to pixel space and
    # binned against each trace chunk's static pixel-tile rect
    # (trace_kernel.cluster_screen_rects/_raster_items) instead of the
    # per-ray slab cull. Coverage is exact (no supercluster budget), the
    # per-pixel test stays ray-triangle, so the primitive-id buffer is
    # identical to the ray-cast path's. Only the tiled/Morton pixel
    # orders support it (chunk = pixel tile).
    primary_raster: bool = False
    # Attribute-pass work-item filter (trace_kernel.trace_closest_attrs):
    # the attribute grid runs over only the clusters that contain some
    # ray's WINNING primitive (typically 1-5 per chunk vs the full
    # ~m_budget union). Rays whose winner item falls past the
    # attr_avg_items-per-chunk capacity repair through the stale-fixup
    # gather (capacity-guarded; residual surfaces in primary_uncertain).
    attr_item_filter: bool = False
    attr_avg_items: int = 8
    # Material-sampler anisotropic filtering taps (reference:
    # scene.c:546-557 enables maxAnisotropy=16 in hardware). Default 1 =
    # isotropic trilinear: each extra tap is a full trilinear gather per
    # pixel on the hottest gather path, so the software cost is linear
    # where the reference's is free.
    max_anisotropy: int = 1

    def resolved_traversal(self, triangle_count: int) -> str:
        if self.traversal != "auto":
            return self.traversal
        if triangle_count > 4096:
            return "wavefront"
        return "bruteforce"

    def resolved_shadow_sc(self, cluster_count: int) -> int:
        """Auto-size the shadow supercluster budget from the scene when
        the field is None: ~10% supercluster coverage, floor 16. The
        retrace fracs stay scene-independent BECAUSE of this scaling —
        with coverage pinned at ~10%, the pass-1 unproven rate stays
        ~1-2% regardless of city size, which frac 32 absorbs with 3x
        headroom. cluster_count must be the scene's static cluster
        count (a Python int, not a traced value)."""
        if self.shadow_sc_budget is not None:
            return self.shadow_sc_budget
        superclusters = -(-int(cluster_count) // 32)
        return max(16, superclusters // 10)


class FrameConstants(NamedTuple):
    """per_frame_constants_t equivalent (main.h:488-505, main.c:2114-2157)."""
    camera_position: jnp.ndarray       # (3,)
    pixel_to_ray: jnp.ndarray          # (3, 3) pixel -> world ray direction
    exposure_factor: jnp.ndarray       # ()
    roughness_factor: jnp.ndarray      # ()
    mis_visibility_estimate: jnp.ndarray  # ()
    error_factor: jnp.ndarray          # ()
    noise_random_numbers: jnp.ndarray  # (4,) uint32


# ---------------------------------------------------------------------------
# Error display (shading_pass.frag.glsl:76-114)
# ---------------------------------------------------------------------------

_TAB20B = jnp.asarray(np.array([
    [0.04092, 0.04374, 0.19120], [0.08438, 0.08866, 0.36625],
    [0.14703, 0.15593, 0.62396], [0.33245, 0.34191, 0.73046],
    [0.12477, 0.19120, 0.04092], [0.26225, 0.36131, 0.08438],
    [0.46208, 0.62396, 0.14703], [0.61721, 0.70838, 0.33245],
    [0.26225, 0.15293, 0.03071], [0.50888, 0.34191, 0.04092],
    [0.79910, 0.49102, 0.08438], [0.79910, 0.59720, 0.29614],
    [0.23074, 0.04519, 0.04092], [0.41789, 0.06663, 0.06848],
    [0.67244, 0.11954, 0.14703], [0.79910, 0.30499, 0.33245],
    [0.19807, 0.05286, 0.17144], [0.37626, 0.08228, 0.29614],
    [0.61721, 0.15293, 0.50888], [0.73046, 0.34191, 0.67244],
], np.float32))


def error_to_color(error, error_factor):
    min_error = 1.0
    max_error = 10.0 ** (5.0 - 0.01)
    e = jnp.clip(jnp.abs(error_factor * error), min_error, max_error)
    color_index = jnp.log2(e) * (20.0 / (5.0 * jnp.log2(10.0)))
    idx = jnp.clip(color_index.astype(jnp.int32), 0, 19)
    return _TAB20B[idx]


# ---------------------------------------------------------------------------
# Shading-data reconstruction (shading_pass.frag.glsl:720-826)
# ---------------------------------------------------------------------------

class GeometryAttributes(NamedTuple):
    """Per-pixel triangle-derived attributes (glsl:738-812) — everything
    get_shading_data needs BEFORE the texture fetch. Produced either by
    geometry_attributes (XLA, shading_rows gather) or by the Pallas
    attribute-fetch kernel (trace_kernel.trace_closest_attrs)."""
    normal_interp: jnp.ndarray   # (3,) normalized interpolated normal
    tex_coord: jnp.ndarray       # (2,)
    duv_dx: jnp.ndarray          # (2,)
    duv_dy: jnp.ndarray          # (2,)
    tangent: jnp.ndarray         # (3,) unnormalized
    bitangent: jnp.ndarray       # (3,)
    mean_tangent_length: jnp.ndarray  # ()
    material_index: jnp.ndarray  # () int32


def geometry_attributes(scene, constants: FrameConstants, primitive_index,
                        ray_direction):
    """XLA path: one packed shading_rows gather + re-intersection math.
    Returns (GeometryAttributes, position (3,)). Unbatched (one pixel)."""
    # One packed 100-byte row gather instead of four (scene.shading_rows
    # carries positions+normals+uvs+material index; gathers cost per row).
    row = scene.shading_rows[primitive_index]
    positions = row[0:9].reshape(3, 3)
    normals = row[9:18].reshape(3, 3)
    tex_coords = row[18:24].reshape(3, 2)
    material_index = row[24].astype(jnp.int32)

    bary, bary_derivs = ray_triangle_barycentrics(
        constants.camera_position, ray_direction, positions,
        constants.pixel_to_ray[:, :2].T)  # derivative rows: d ray / d pixel

    position = bary[0] * positions[0] + bary[1] * positions[1] \
        + bary[2] * positions[2]
    interp_normal = normalize(bary[0] * normals[0] + bary[1] * normals[1]
                              + bary[2] * normals[2])
    tex_coord = bary[0] * tex_coords[0] + bary[1] * tex_coords[1] \
        + bary[2] * tex_coords[2]
    tex_coord_derivs = jnp.sum(bary_derivs[:, :, None]
                               * tex_coords[None, :, :], axis=1)

    # Tangent frame from UV edges (glsl:800-812).
    edges = jnp.stack([positions[1] - positions[0],
                       positions[2] - positions[0]])
    tex_edges = jnp.stack([tex_coords[1] - tex_coords[0],
                           tex_coords[2] - tex_coords[0]])
    normal_cross_e0 = jnp.cross(interp_normal, edges[0])
    e1_cross_normal = jnp.cross(edges[1], interp_normal)
    tangent = e1_cross_normal * tex_edges[0, 0] + normal_cross_e0 * tex_edges[1, 0]
    bitangent = e1_cross_normal * tex_edges[0, 1] + normal_cross_e0 * tex_edges[1, 1]
    mean_tangent_length = jnp.sqrt(0.5 * (jnp.sum(tangent ** 2)
                                          + jnp.sum(bitangent ** 2)))
    geom = GeometryAttributes(
        normal_interp=interp_normal, tex_coord=tex_coord,
        duv_dx=tex_coord_derivs[0], duv_dy=tex_coord_derivs[1],
        tangent=tangent, bitangent=bitangent,
        mean_tangent_length=mean_tangent_length,
        material_index=material_index)
    return geom, position


def geometry_attributes_from_planes(attrs_row):
    """Adapt one attribute-kernel output row (trace_kernel.ATTR_PLANES,)
    to GeometryAttributes (same quantities, computed in-kernel)."""
    return GeometryAttributes(
        normal_interp=attrs_row[0:3],
        tex_coord=attrs_row[3:5],
        duv_dx=attrs_row[5:7],
        duv_dy=attrs_row[7:9],
        tangent=attrs_row[9:12],
        bitangent=attrs_row[12:15],
        mean_tangent_length=attrs_row[15],
        material_index=attrs_row[16].astype(jnp.int32))


def finish_shading_data(scene, constants: FrameConstants, roughness_factor,
                        geom: GeometryAttributes, position,
                        max_anisotropy: int = 1):
    """Texture fetch + Falcor decode + normal mapping + hemisphere clip
    (glsl:779-823); unbatched. max_anisotropy mirrors the reference
    material sampler's anisotropic filtering (scene.c:546-557,
    maxAnisotropy=16); the default of 1 keeps the single-trilinear gather
    cost (each anisotropy tap adds a full trilinear fetch on the hottest
    gather path)."""
    # One 8-channel fetch: [base.rgb, specular.rgb, normal.xy].
    texel = sample_texture_grad(
        scene.material_atlas, geom.material_index, geom.tex_coord,
        geom.duv_dx, geom.duv_dy, max_anisotropy=max_anisotropy)
    base_color = texel[0:3]
    specular_data = texel[3:6]
    normal_ts_xy = texel[6:8] * 2.0 - 1.0
    normal_ts_z = jnp.sqrt(jnp.maximum(
        0.0, 1.0 - normal_ts_xy[0] ** 2 - normal_ts_xy[1] ** 2))

    # Falcor/Unreal-compatible material decode (glsl:786-796).
    metalicity = specular_data[2]
    diffuse_albedo = base_color - metalicity * base_color
    fresnel_0 = (1.0 - metalicity) * 0.02 + metalicity * base_color
    linear_roughness = specular_data[1]
    roughness = linear_roughness * linear_roughness
    roughness = jnp.clip(roughness * roughness_factor, 0.0064, 1.0)

    nz = normal_ts_z * jnp.maximum(1.0e-10, geom.mean_tangent_length)
    normal = normalize(normal_ts_xy[0] * geom.tangent
                       + normal_ts_xy[1] * geom.bitangent
                       + nz * geom.normal_interp)

    # Clip the shading normal into the outgoing hemisphere (glsl:815-823).
    outgoing = normalize(constants.camera_position - position)
    normal_offset = jnp.maximum(0.0, 1.0e-3 - jnp.sum(normal * outgoing))
    normal = normalize(normal_offset * outgoing + normal)

    return ShadingData(
        position=position,
        normal=normal,
        outgoing=outgoing,
        lambert_outgoing=jnp.sum(normal * outgoing),
        diffuse_albedo=diffuse_albedo,
        fresnel_0=fresnel_0,
        roughness=roughness,
    )


def get_shading_data(scene, constants: FrameConstants,
                     roughness_factor, primitive_index, ray_direction,
                     max_anisotropy: int = 1):
    """Recover full shading data by re-intersecting the view ray with the
    visible triangle; unbatched (one pixel). Composition of
    geometry_attributes + finish_shading_data (split so the Pallas
    attribute-fetch kernel can replace the first half on TPU)."""
    geom, position = geometry_attributes(scene, constants, primitive_index,
                                         ray_direction)
    return finish_shading_data(scene, constants, roughness_factor, geom,
                               position, max_anisotropy)


# ---------------------------------------------------------------------------
# Light radiance / visibility / BRDF product (glsl:119-239)
# ---------------------------------------------------------------------------

def _light_field(lights, i: int, name: str):
    return getattr(lights, name)[i]


def get_polygon_radiance(scene, light_index: int, texturing: int,
                         sampled_dir, shading_position):
    """Incoming radiance from a light along sampled_dir (glsl:142-185).
    `texturing` is static per light."""
    lights = scene.lights
    radiance = lights.surface_radiance[light_index]
    if texturing == 0:  # none
        return radiance
    plane = lights.plane[light_index]
    rotation = lights.rotation[light_index]
    if texturing == 1:  # area
        t = -(jnp.sum(plane[:3] * shading_position) + plane[3]) \
            / jnp.sum(sampled_dir * plane[:3])
        intersection = shading_position + t * sampled_dir \
            - lights.translation[light_index]
        plane_space = rotation.T @ intersection
        tex_coord = plane_space[:2] * jnp.stack([
            lights.inv_scaling_x[light_index],
            lights.inv_scaling_y[light_index]])
    else:
        if texturing == 3:  # IES profile
            lookup_dir = rotation.T @ sampled_dir
            radiance = radiance / jnp.abs(lookup_dir[2])
        else:  # light probe convention
            lookup_dir = jnp.stack([-sampled_dir[0], sampled_dir[1],
                                    sampled_dir[2]])
        tex_coord = jnp.stack([
            jnp.arctan2(lookup_dir[1], lookup_dir[0]) * (0.5 * M_INV_PI),
            jnp.arccos(jnp.clip(lookup_dir[2], -1.0, 1.0)) * M_INV_PI])
    texel = sample_texture_lod0(scene.light_atlas,
                                scene.lights.texture_index[light_index],
                                tex_coord)
    return radiance * texel[:3]


def radiance_brdf_deferred(scene, light_index: int, texturing: int,
                           sampled_dir, data: ShadingData,
                           diffuse=True, specular=True):
    """Deferred version of get_polygon_radiance_visibility_brdf_product
    (glsl:195-239): returns the value ASSUMING the shadow ray is
    unoccluded (the geometric lambert > 0 gate still applies), plus the
    shadow-ray t range. Visibility is applied later: every estimator in
    the shading pass is affine in V, so shadow rays batch into one
    wavefront trace instead of a per-sample pointer chase.

    Returns (value_if_visible (3,), lambert, t_max)."""
    lambert = jnp.sum(data.normal * sampled_dir)
    geo_visible = lambert > 0.0
    plane = scene.lights.plane[light_index]
    denom = jnp.sum(sampled_dir * plane[:3])
    t_max = -(jnp.sum(plane[:3] * data.position) + plane[3]) \
        / jnp.where(denom != 0.0, denom, 1.0)
    radiance = get_polygon_radiance(scene, light_index, texturing,
                                    sampled_dir, data.position)
    brdf = evaluate_brdf(data, sampled_dir, diffuse, specular)
    value = jnp.where(geo_visible, radiance * brdf, 0.0)
    return value, lambert, jnp.where(geo_visible, t_max, 0.0)


# ---------------------------------------------------------------------------
# Per-light shading (glsl:329-711)
# ---------------------------------------------------------------------------

def _light_vertices_padded(lights, light_index: int):
    """World-space light vertices padded to MAXV lanes (first repeated)."""
    verts = lights.vertices_world_space[light_index]  # (MAXL, 3)
    maxl = verts.shape[0]
    if maxl < MAXV:
        verts = jnp.concatenate(
            [verts, jnp.broadcast_to(verts[0], (MAXV - maxl, 3))], axis=0)
    return verts


def _transform_to_local(world_to_local, verts):
    """Apply a (3,4) affine transform to (MAXV, 3) points."""
    return verts @ world_to_local[:, :3].T + world_to_local[:, 3]


def _mis_estimate_with_settings(settings, visibility, integrand,
                                sampled_weight, sampled_density,
                                other_weight, other_density, vis_estimate):
    heuristic = {
        MisHeuristic.BALANCE: "balance",
        MisHeuristic.POWER: "power",
        MisHeuristic.WEIGHTED: "weighted",
        MisHeuristic.OPTIMAL_CLAMPED: "optimal_clamped",
        MisHeuristic.OPTIMAL: "optimal",
    }[settings.mis_heuristic]
    from ..ops.mis import MisHeuristic as OpsMis
    return mis_estimate(OpsMis(heuristic), visibility, integrand,
                        sampled_weight, sampled_density, other_weight,
                        other_density, vis_estimate)


class LightShadingResult(NamedTuple):
    """Deferred shading output for one light at one pixel: the total
    contribution is base + sum_i b[i] * V_i where V_i is the visibility of
    shadow ray i (all estimators are affine in V)."""
    base: jnp.ndarray      # (3,)
    b: jnp.ndarray         # (S, 3)
    ray_dirs: jnp.ndarray  # (S, 3)
    t_max: jnp.ndarray     # (S,)


def _no_ray(a_color, ray_count: int):
    return (a_color, jnp.zeros((ray_count, 3)),
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (ray_count, 3)),
            jnp.zeros((ray_count,)))


def evaluate_polygonal_light_shading(scene, static: SceneStatic,
                                     settings: RenderSettings,
                                     constants: FrameConstants,
                                     light_index: int,
                                     data: ShadingData,
                                     ltc: LtcCoefficients,
                                     noise_pairs) -> LightShadingResult:
    """Monte Carlo shading for one light at one pixel; unbatched.
    noise_pairs: (pairs_per_light(settings), 2). Shadow rays are emitted
    for deferred batched tracing (see LightShadingResult)."""
    tech = settings.polygon_sampling_technique
    strategy = settings.sampling_strategy
    lights = scene.lights
    texturing = static.light_texturing[light_index]
    n = settings.sample_count
    rays_each = pairs_per_light(settings) // max(n, 1) \
        if settings.error_display == ErrorDisplay.NONE else 1
    total_rays = rays_per_light(settings)
    verts_world = _light_vertices_padded(lights, light_index)
    vertex_count = lights.vertex_count[light_index].astype(jnp.int32)

    def rad_brdf(sampled_dir, diffuse=True, specular=True):
        return radiance_brdf_deferred(scene, light_index, texturing,
                                      sampled_dir, data, diffuse, specular)

    def light_splat(sampled_dir, density):
        """get_polygonal_light_mis_estimate (glsl:300-323), deferred:
        returns (a, b, dir, t_max) for a single shadow ray."""
        value1, lambert, t_max = rad_brdf(sampled_dir)
        if strategy == SamplingStrategy.DIFFUSE_ONLY:
            b = jnp.where(density > 0.0,
                          value1 * (lambert / jnp.where(density > 0.0,
                                                        density, 1.0)), 0.0)
        elif strategy == SamplingStrategy.DIFFUSE_GGX_MIS:
            ggx_density = ggx_reflected_direction_density(
                data.lambert_outgoing, data.outgoing, sampled_dir,
                data.normal, data.roughness)
            heuristic = "power" if settings.mis_heuristic == MisHeuristic.POWER \
                else "balance"
            from ..ops.mis import MisHeuristic as OpsMis
            wod = mis_weight_over_density(OpsMis(heuristic), density,
                                          ggx_density)
            b = value1 * lambert * wod
        else:
            b = jnp.zeros(3)
        return jnp.zeros(3), b[None], sampled_dir[None], t_max[None]

    pair_cursor = 0

    def next_pair():
        nonlocal pair_cursor
        p = noise_pairs[pair_cursor]
        pair_cursor += 1
        return p

    def take_pairs(count):
        nonlocal pair_cursor
        p = noise_pairs[pair_cursor:pair_cursor + count]
        pair_cursor += count
        return p

    def over_samples(per_sample, pairs):
        """vmap a per-sample deferred estimator over its noise pairs.
        The reference unrolls these loops for GPU ray-query reasons
        (unrolling.glsl); on TPU independent samples vectorize instead.
        Returns (a_sum (3,), b (n*R, 3), dirs (n*R, 3), t_max (n*R,))."""
        if n == 1:
            return per_sample(pairs[0])
        a, b, dirs, t_max = jax.vmap(per_sample)(pairs)
        return (jnp.sum(a, axis=0), b.reshape(-1, 3), dirs.reshape(-1, 3),
                t_max.reshape(-1))

    def finish(parts):
        """Combine (a, b, dirs, tmax) pieces, scale by 1/n, pad to
        total_rays."""
        a = jnp.zeros(3)
        bs, ds, ts = [], [], []
        for (pa, pb, pd, pt) in parts:
            a = a + pa
            bs.append(pb)
            ds.append(pd)
            ts.append(pt)
        b = jnp.concatenate(bs, axis=0) if bs else jnp.zeros((0, 3))
        d = jnp.concatenate(ds, axis=0) if ds else jnp.zeros((0, 3))
        t = jnp.concatenate(ts, axis=0) if ts else jnp.zeros((0,))
        pad = total_rays - b.shape[0]
        if pad > 0:
            b = jnp.concatenate([b, jnp.zeros((pad, 3))])
            d = jnp.concatenate(
                [d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))])
            t = jnp.concatenate([t, jnp.zeros((pad,))])
        scale = F32(1.0 / n)
        return LightShadingResult(a * scale, b * scale, d, t)

    # ---- world-space techniques (no clipping) ------------------------------
    if tech == PolygonSamplingTechnique.BASELINE:
        corner_offset = lights.translation[light_index] - data.position
        rot = lights.rotation[light_index]

        def one_sample(rnd):
            d = normalize(corner_offset + rnd[0] * rot[:, 0]
                          + rnd[1] * rot[:, 1])
            return light_splat(d, F32(1.0))

        parts = [over_samples(one_sample, take_pairs(n))]

    elif tech == PolygonSamplingTechnique.AREA_TURK:
        fan_areas = lights.fan_areas[light_index]  # (MAXL-2, 2)

        def one_sample(rnd):
            light_sample = _sample_area_polygon_turk(
                vertex_count, verts_world, fan_areas, rnd)
            offset = light_sample - data.position
            dist_sq = jnp.sum(offset * offset)
            d = offset / jnp.sqrt(dist_sq)
            projected = jnp.abs(jnp.sum(lights.plane[light_index][:3] * d)) \
                * lights.area[light_index]
            density = dist_sq / projected
            return light_splat(d, density)

        parts = [over_samples(one_sample, take_pairs(n))]

    elif tech == PolygonSamplingTechnique.SOLID_ANGLE:
        poly = sampling.prepare_solid_angle_polygon_sampling(
            verts_world, vertex_count, data.position)
        density = 1.0 / jnp.where(poly.solid_angle > 0.0, poly.solid_angle, 1.0)

        def one_sample(rnd):
            d = sampling.sample_solid_angle_polygon(poly, rnd)
            a, b, dirs, t_max = light_splat(d, density)
            return a, jnp.where(poly.solid_angle > 0.0, b, 0.0), dirs, t_max

        parts = [over_samples(one_sample, take_pairs(n))]

    elif tech == PolygonSamplingTechnique.SOLID_ANGLE_ARVO:
        poly = sampling_related.prepare_solid_angle_polygon_sampling_arvo(
            verts_world, vertex_count, data.position)
        density = 1.0 / jnp.where(poly.solid_angle > 0.0, poly.solid_angle, 1.0)

        def one_sample(rnd):
            d = sampling_related.sample_solid_angle_polygon_arvo(poly, rnd)
            a, b, dirs, t_max = light_splat(d, density)
            return a, jnp.where(poly.solid_angle > 0.0, b, 0.0), dirs, t_max

        parts = [over_samples(one_sample, take_pairs(n))]

    elif tech == PolygonSamplingTechnique.RECTANGLE_SOLID_ANGLE_URENA:
        # Valid for rectangular lights only (GUI legality in the reference;
        # call signature per shading_pass.frag.glsl:355-362).
        rot = lights.rotation[light_index]
        sx = lights.scaling_x[light_index]
        sy = lights.scaling_y[light_index]
        squad = sampling_related.prepare_solid_angle_rectangle_sampling_urena(
            lights.translation[light_index], sx * rot[:, 0], sy * rot[:, 1],
            sx, sy, rot[:, 0], rot[:, 1], rot[:, 2], data.position)
        density = 1.0 / jnp.where(squad.solid_angle > 0.0,
                                  squad.solid_angle, 1.0)

        def one_sample(rnd):
            d = sampling_related.sample_solid_angle_rectangle_urena(squad, rnd)
            a, b, dirs, t_max = light_splat(d, density)
            return a, jnp.where(squad.solid_angle > 0.0, b, 0.0), dirs, t_max

        parts = [over_samples(one_sample, take_pairs(n))]

    # ---- shading-space techniques (clipping, diffuse-only family) ----------
    elif tech in (PolygonSamplingTechnique.CLIPPED_SOLID_ANGLE,
                  PolygonSamplingTechnique.BILINEAR_COSINE_WARP_HART,
                  PolygonSamplingTechnique.BILINEAR_COSINE_WARP_CLIPPING_HART,
                  PolygonSamplingTechnique.BIQUADRATIC_COSINE_WARP_HART,
                  PolygonSamplingTechnique.BIQUADRATIC_COSINE_WARP_CLIPPING_HART):
        verts_shading = _transform_to_local(ltc.world_to_shading_space,
                                            verts_world)
        no_clip = tech in (
            PolygonSamplingTechnique.BILINEAR_COSINE_WARP_HART,
            PolygonSamplingTechnique.BIQUADRATIC_COSINE_WARP_HART)
        if no_clip:
            clipped, clip_count = verts_shading, vertex_count
            ok = jnp.bool_(True)
        else:
            clipped, clip_count = clip_polygon(verts_shading, vertex_count)
            ok = clip_count > 0
        rot_t = ltc.world_to_shading_space[:, :3]  # rows = axes

        if tech == PolygonSamplingTechnique.CLIPPED_SOLID_ANGLE:
            poly = sampling.prepare_solid_angle_polygon_sampling(
                clipped, jnp.maximum(clip_count, 3), jnp.zeros(3))
            density = 1.0 / jnp.where(poly.solid_angle > 0.0,
                                      poly.solid_angle, 1.0)

            def one_sample(rnd):
                d_shading = sampling.sample_solid_angle_polygon(poly, rnd)
                d = rot_t.T @ d_shading
                a, b, dirs, t_max = light_splat(d, density)
                good = ok & (poly.solid_angle > 0.0)
                return a, jnp.where(good, b, 0.0), dirs, t_max
        else:
            bilinear = tech in (
                PolygonSamplingTechnique.BILINEAR_COSINE_WARP_HART,
                PolygonSamplingTechnique.BILINEAR_COSINE_WARP_CLIPPING_HART)
            if bilinear:
                warp = sampling_related \
                    .prepare_bilinear_cosine_warp_polygon_sampling_hart(
                        clipped, jnp.maximum(clip_count, 3))
                sample_fn = sampling_related \
                    .sample_bilinear_cosine_warp_polygon_hart
            else:
                warp = sampling_related \
                    .prepare_biquadratic_cosine_warp_polygon_sampling_hart(
                        clipped, jnp.maximum(clip_count, 3))
                sample_fn = sampling_related \
                    .sample_biquadratic_cosine_warp_polygon_hart
            poly = warp.polygon

            def one_sample(rnd):
                d_shading, density = sample_fn(warp, rnd)
                d = rot_t.T @ d_shading
                a, b, dirs, t_max = light_splat(d, density)
                good = ok & (poly.solid_angle > 0.0)
                return a, jnp.where(good, b, 0.0), dirs, t_max

        parts = [over_samples(one_sample, take_pairs(n))]

    # ---- projected solid angle (ours), diffuse-only family + combined ------
    elif tech in (PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE,
                  PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE_BIASED,
                  PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE_ARVO):
        biased = tech == PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE_BIASED
        use_arvo = tech == PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE_ARVO
        # Flip the shading frame's y if the shading point is behind the light
        # plane to restore clockwise winding (glsl:444-452).
        plane = lights.plane[light_index]
        side = jnp.sum(plane[:3] * data.position) + plane[3]
        flip = jnp.where(side < 0.0, -1.0, 1.0)
        w2s = ltc.world_to_shading_space.at[1].multiply(flip)
        w2c = ltc.world_to_cosine_space.at[1].multiply(flip)
        rot_t = w2s[:, :3]

        verts_shading = _transform_to_local(w2s, verts_world)
        clipped, clip_count = clip_polygon(verts_shading, vertex_count)
        diffuse_ok = clip_count > 0
        if use_arvo and strategy in (SamplingStrategy.DIFFUSE_ONLY,
                                     SamplingStrategy.DIFFUSE_GGX_MIS):
            poly_arvo = arvo_psa \
                .prepare_projected_solid_angle_polygon_sampling_arvo(
                    clipped, jnp.maximum(clip_count, 3))
            psa_d = poly_arvo.projected_solid_angle
            diffuse_ok = diffuse_ok & (psa_d > 0.0)

            if settings.error_display in (ErrorDisplay.DIFFUSE_BACKWARD,
                                          ErrorDisplay.DIFFUSE_BACKWARD_SCALED):
                rnd = next_pair()
                d = arvo_psa.sample_projected_solid_angle_polygon_arvo(
                    poly_arvo, rnd, 3)
                errors = arvo_psa \
                    .compute_projected_solid_angle_polygon_sampling_error_arvo(
                        poly_arvo, rnd, d)
                error_index = {
                    ErrorDisplay.DIFFUSE_BACKWARD: 0,
                    ErrorDisplay.DIFFUSE_BACKWARD_SCALED: 1,
                }[settings.error_display]
                color = error_to_color(errors[error_index],
                                       constants.error_factor)
                return LightShadingResult(*_no_ray(
                    jnp.where(diffuse_ok, color / constants.exposure_factor,
                              0.0), total_rays))

            def one_sample_arvo(rnd):
                d_shading = arvo_psa.sample_projected_solid_angle_polygon_arvo(
                    poly_arvo, rnd, 3)
                density = d_shading[2] / jnp.where(psa_d > 0.0, psa_d, 1.0)
                d = rot_t.T @ d_shading
                a, b, dirs, t_max = light_splat(d, density)
                # Arvo's method lands samples exactly on the horizon (the
                # elevation of clipped edges is 0); there the analytic
                # lambert/z cancellation breaks down in fp32 and fireflies
                # explode, so tiny-z samples are dropped (the reference
                # exhibits the same fireflies — this is the unstable
                # baseline the paper compares against).
                good = diffuse_ok & (d_shading[2] > 1e-5)
                return a, jnp.where(good, b, 0.0), dirs, t_max

            parts = [over_samples(one_sample_arvo, take_pairs(n))]
            if strategy == SamplingStrategy.DIFFUSE_GGX_MIS:
                parts.append(_ggx_mis_loop(
                    settings, constants, data, ltc, rot_t, scene, light_index,
                    texturing, verts_world, vertex_count,
                    1.0 / jnp.where(psa_d > 0.0, psa_d, 1.0), True,
                    take_pairs(n), rad_brdf))
            return finish(parts)

        poly_diffuse = sampling.prepare_projected_solid_angle_polygon_sampling(
            clipped, jnp.maximum(clip_count, 3), biased=biased)
        psa_d = poly_diffuse.projected_solid_angle
        diffuse_ok = diffuse_ok & (psa_d > 0.0)

        if strategy in (SamplingStrategy.DIFFUSE_ONLY,
                        SamplingStrategy.DIFFUSE_GGX_MIS):
            if settings.error_display in (ErrorDisplay.DIFFUSE_BACKWARD,
                                          ErrorDisplay.DIFFUSE_BACKWARD_SCALED,
                                          ErrorDisplay.DIFFUSE_FORWARD):
                rnd = next_pair()
                d = sampling.sample_projected_solid_angle_polygon(
                    poly_diffuse, rnd, biased=biased)
                errors = sampling.compute_projected_solid_angle_polygon_sampling_error(
                    poly_diffuse, rnd, d)
                error_index = {
                    ErrorDisplay.DIFFUSE_BACKWARD: 0,
                    ErrorDisplay.DIFFUSE_BACKWARD_SCALED: 1,
                    ErrorDisplay.DIFFUSE_FORWARD: 2,
                }[settings.error_display]
                color = error_to_color(errors[error_index],
                                       constants.error_factor)
                return LightShadingResult(*_no_ray(
                    jnp.where(diffuse_ok, color / constants.exposure_factor,
                              0.0), total_rays))

            def one_sample(rnd):
                d_shading = sampling.sample_projected_solid_angle_polygon(
                    poly_diffuse, rnd, biased=biased)
                density = d_shading[2] / jnp.where(psa_d > 0.0, psa_d, 1.0)
                d = rot_t.T @ d_shading
                a, b, dirs, t_max = light_splat(d, density)
                return a, jnp.where(diffuse_ok, b, 0.0), dirs, t_max

            parts = [over_samples(one_sample, take_pairs(n))]
        else:
            # Combined diffuse+specular strategies (glsl:506-670).
            verts_cosine = _transform_to_local(w2c, verts_world)
            clipped_c, clip_count_c = clip_polygon(verts_cosine, vertex_count)
            poly_specular = sampling.prepare_projected_solid_angle_polygon_sampling(
                clipped_c, jnp.maximum(clip_count_c, 3), biased=biased)
            psa_s = jnp.where(clip_count_c > 0,
                              poly_specular.projected_solid_angle, 0.0)
            specular_ok = psa_s > 0.0
            specular_albedo = ltc.albedo
            specular_weight = specular_albedo * psa_s

            if settings.error_display != ErrorDisplay.NONE:
                is_specular = settings.error_display in (
                    ErrorDisplay.SPECULAR_BACKWARD,
                    ErrorDisplay.SPECULAR_BACKWARD_SCALED,
                    ErrorDisplay.SPECULAR_FORWARD)
                poly_err = poly_specular if is_specular else poly_diffuse
                ok = specular_ok if is_specular else diffuse_ok
                rnd = next_pair()
                d = sampling.sample_projected_solid_angle_polygon(
                    poly_err, rnd, biased=biased)
                errors = sampling.compute_projected_solid_angle_polygon_sampling_error(
                    poly_err, rnd, d)
                error_index = {
                    ErrorDisplay.DIFFUSE_BACKWARD: 0,
                    ErrorDisplay.DIFFUSE_BACKWARD_SCALED: 1,
                    ErrorDisplay.DIFFUSE_FORWARD: 2,
                    ErrorDisplay.SPECULAR_BACKWARD: 0,
                    ErrorDisplay.SPECULAR_BACKWARD_SCALED: 1,
                    ErrorDisplay.SPECULAR_FORWARD: 2,
                }[settings.error_display]
                color = error_to_color(errors[error_index],
                                       constants.error_factor)
                return LightShadingResult(*_no_ray(
                    jnp.where(ok, color / constants.exposure_factor, 0.0),
                    total_rays))

            if strategy == SamplingStrategy.DIFFUSE_SPECULAR_SEPARATELY:
                def one_sample(pair2):
                    d_shading = sampling.sample_projected_solid_angle_polygon(
                        poly_diffuse, pair2[0], biased=biased)
                    d = rot_t.T @ d_shading
                    value1, lambert, t_max_d = rad_brdf(d, True, False)
                    b_d = jnp.where(diffuse_ok, value1 * psa_d, 0.0)
                    d_cosine = sampling.sample_projected_solid_angle_polygon(
                        poly_specular, pair2[1], biased=biased)
                    d_shading_s = normalize(
                        ltc.cosine_to_shading_space @ d_cosine)
                    ltc_density = evaluate_ltc_density(ltc, d_shading_s, F32(1.0))
                    d_s = rot_t.T @ d_shading_s
                    value_s, _, t_max_s = rad_brdf(d_s, False, True)
                    spec = value_s * d_shading_s[2] * psa_s \
                        / jnp.where(ltc_density > 0.0, ltc_density, 1.0)
                    good = specular_ok & (d_shading_s[2] > 0.0) \
                        & (d_cosine[2] > 0.0) & (ltc_density > 0.0)
                    b_s = jnp.where(diffuse_ok & good, spec, 0.0)
                    return (jnp.zeros(3), jnp.stack([b_d, b_s]),
                            jnp.stack([d, d_s]),
                            jnp.stack([t_max_d, t_max_s]))

                pairs2 = take_pairs(2 * n).reshape(n, 2, 2)
                if n == 1:
                    parts = [one_sample(pairs2[0])]
                else:
                    a, b, dirs, t_max = jax.vmap(one_sample)(pairs2)
                    parts = [(jnp.sum(a, 0), b.reshape(-1, 3),
                              dirs.reshape(-1, 3), t_max.reshape(-1))]

            elif strategy == SamplingStrategy.DIFFUSE_SPECULAR_MIS:
                diffuse_albedo = jnp.maximum(data.diffuse_albedo, 0.01)
                diffuse_weight = diffuse_albedo * psa_d
                rcp_psa_d = 1.0 / jnp.where(psa_d > 0.0, psa_d, 1.0)
                rcp_psa_s = 1.0 / jnp.where(psa_s > 0.0, psa_s, 1.0)
                specular_weight_rgb = jnp.broadcast_to(specular_weight, (3,))
                if settings.mis_heuristic == MisHeuristic.OPTIMAL:
                    radiance_over_pi = lights.surface_radiance[light_index] \
                        * F32(M_INV_PI)
                    diffuse_weight = diffuse_weight * radiance_over_pi
                    specular_weight_rgb = specular_weight_rgb * radiance_over_pi

                def one_sample(pair2):
                    d_diffuse = sampling.sample_projected_solid_angle_polygon(
                        poly_diffuse, pair2[0], biased=biased)
                    d_spec_c = sampling.sample_projected_solid_angle_polygon(
                        poly_specular, pair2[1], biased=biased)
                    d_specular = normalize(
                        ltc.cosine_to_shading_space @ d_spec_c)
                    a_out = jnp.zeros(3)
                    b_out, dir_out, t_out = [], [], []
                    for j, d_shading in enumerate((d_diffuse, d_specular)):
                        in_upper = d_shading[2] > 0.0
                        diffuse_density = d_shading[2] * rcp_psa_d
                        specular_density = evaluate_ltc_density(
                            ltc, d_shading, rcp_psa_s)
                        d_world = rot_t.T @ d_shading
                        value1, _, t_max = rad_brdf(d_world)
                        integrand1 = d_shading[2] * value1
                        if j == 0:
                            weights = (diffuse_weight, diffuse_density,
                                       specular_weight_rgb, specular_density)
                        else:
                            weights = (specular_weight_rgb, specular_density,
                                       diffuse_weight, diffuse_density)
                        # The estimator is affine in the integrand (and the
                        # integrand is linear in V): split into the
                        # V-independent part est(0) and the ray weight.
                        est0 = _mis_estimate_with_settings(
                            settings, True, jnp.zeros(3), *weights,
                            constants.mis_visibility_estimate)
                        est1 = _mis_estimate_with_settings(
                            settings, True, integrand1, *weights,
                            constants.mis_visibility_estimate)
                        if j == 0:
                            no_mis1 = integrand1 / jnp.where(
                                diffuse_density > 0.0, diffuse_density, 1.0)
                            a_term = jnp.where(specular_ok, est0, 0.0)
                            b_term = jnp.where(specular_ok, est1 - est0,
                                               no_mis1)
                            gate = in_upper & diffuse_ok
                        else:
                            a_term = est0
                            b_term = est1 - est0
                            gate = in_upper & diffuse_ok & specular_ok
                        a_out = a_out + jnp.where(gate, a_term, 0.0)
                        b_out.append(jnp.where(gate, b_term, 0.0))
                        dir_out.append(d_world)
                        t_out.append(t_max)
                    return (a_out, jnp.stack(b_out), jnp.stack(dir_out),
                            jnp.stack(t_out))

                pairs2 = take_pairs(2 * n).reshape(n, 2, 2)
                if n == 1:
                    parts = [one_sample(pairs2[0])]
                else:
                    a, b, dirs, t_max = jax.vmap(one_sample)(pairs2)
                    parts = [(jnp.sum(a, 0), b.reshape(-1, 3),
                              dirs.reshape(-1, 3), t_max.reshape(-1))]

            elif strategy == SamplingStrategy.DIFFUSE_SPECULAR_RANDOM:
                lum = jnp.array([0.21263901, 0.71516868, 0.07219232])
                diffuse_albedo = jnp.maximum(
                    jnp.sum(data.diffuse_albedo * lum), 0.01)
                diffuse_weight = diffuse_albedo * psa_d
                ratio = diffuse_weight / (diffuse_weight + specular_weight)

                def one_sample(rnd):
                    spec_selected = rnd[0] >= ratio
                    offset = jnp.where(spec_selected, 1.0, 0.0)
                    r0 = (rnd[0] - offset) / (ratio - offset)
                    rnd2 = jnp.stack([r0, rnd[1]])
                    d_d = sampling.sample_projected_solid_angle_polygon(
                        poly_diffuse, rnd2, biased=biased)
                    d_s_c = sampling.sample_projected_solid_angle_polygon(
                        poly_specular, rnd2, biased=biased)
                    d_s = normalize(ltc.cosine_to_shading_space @ d_s_c)
                    d_shading = jnp.where(spec_selected, d_s, d_d)
                    lam = d_shading[2]
                    diffuse_density = lam * diffuse_albedo
                    specular_density = evaluate_ltc_density(ltc, d_shading,
                                                            specular_albedo)
                    density = (diffuse_density + specular_density) \
                        / (diffuse_weight + specular_weight)
                    d_world = rot_t.T @ d_shading
                    value1, _, t_max = rad_brdf(d_world)
                    est = value1 * lam / jnp.where(density > 0.0, density, 1.0)
                    gate = (lam > 0.0) & diffuse_ok & (density > 0.0)
                    return (jnp.zeros(3), jnp.where(gate, est, 0.0)[None],
                            d_world[None], t_max[None])

                parts = [over_samples(one_sample, take_pairs(n))]

        # GGX MIS extra loop shares poly_diffuse.
        if strategy == SamplingStrategy.DIFFUSE_GGX_MIS:
            parts.append(_ggx_mis_loop(
                settings, constants, data, ltc, rot_t, scene, light_index,
                texturing, verts_world, vertex_count,
                1.0 / jnp.where(psa_d > 0.0, psa_d, 1.0), True,
                take_pairs(n), rad_brdf))
        return finish(parts)

    else:
        raise NotImplementedError(
            f"technique {tech} not yet implemented in the TPU shading pass")

    # GGX MIS companion loop for the world/shading-space techniques.
    if strategy == SamplingStrategy.DIFFUSE_GGX_MIS:
        if tech in (PolygonSamplingTechnique.SOLID_ANGLE,
                    PolygonSamplingTechnique.SOLID_ANGLE_ARVO,
                    PolygonSamplingTechnique.CLIPPED_SOLID_ANGLE):
            density_factor = 1.0 / jnp.where(poly.solid_angle > 0.0,
                                             poly.solid_angle, 1.0)
        else:
            density_factor = F32(1.0)
        rot_t = ltc.world_to_shading_space[:, :3]
        parts.append(_ggx_mis_loop(
            settings, constants, data, ltc, rot_t, scene, light_index,
            texturing, verts_world, vertex_count,
            density_factor, False, take_pairs(n), rad_brdf))

    return finish(parts)


def _ggx_mis_loop(settings, constants, data, ltc, rot_t, scene, light_index,
                  texturing, verts_world, vertex_count,
                  density_factor, density_times_lambert: bool, pairs,
                  rad_brdf):
    """BRDF-sampling half of the diffuse/GGX MIS strategy (glsl:676-709);
    deferred: returns (a, b (n,3), dirs (n,3), t_max (n,))."""
    outgoing_shading = rot_t @ data.outgoing
    outgoing_shading = outgoing_shading.at[1].set(0.0)
    plane = scene.lights.plane[light_index]
    from ..ops.mis import MisHeuristic as OpsMis
    heuristic = OpsMis("power") if settings.mis_heuristic == MisHeuristic.POWER \
        else OpsMis("balance")

    def one_sample(rnd):
        d_shading, ggx_density = sample_ggx_reflected_direction(
            outgoing_shading, data.roughness, rnd)
        d_world = rot_t.T @ d_shading
        hit = polygonal_light_ray_intersection(
            plane, scene.lights.vertices_world_space[light_index],
            vertex_count, data.position,
            jnp.concatenate([d_world, jnp.zeros(1)]))
        value1, lambert, t_max = rad_brdf(d_world)
        polygon_density = (lambert * density_factor
                           if density_times_lambert else density_factor)
        wod = mis_weight_over_density(heuristic, ggx_density, polygon_density)
        est = value1 * lambert * wod
        gate = (d_shading[2] > 0.0) & hit
        return jnp.where(gate, est, 0.0), d_world, t_max

    if pairs.shape[0] == 1:
        b, d, t = one_sample(pairs[0])
        return (jnp.zeros(3), b[None], d[None], t[None])
    b, d, t = jax.vmap(one_sample)(pairs)
    return (jnp.zeros(3), b, d, t)


def rays_per_light(settings: RenderSettings) -> int:
    """Static shadow-ray budget per light (one per technique sample plus
    one per GGX/specular companion sample; equals the noise-pair budget)."""
    return pairs_per_light(settings)


def _sample_area_polygon_turk(vertex_count, verts_world, fan_areas, rnd):
    """Uniform area sampling over the triangle fan
    (polygon_sampling_related_work.glsl:38-64). fan_areas: (MAXL-2, 2)."""
    maxl_minus2 = fan_areas.shape[0]
    total_area = fan_areas[maxl_minus2 - 1, 1]
    target = total_area * rnd[0]
    tri = jnp.arange(maxl_minus2)
    valid = tri + 3 <= jnp.maximum(vertex_count, 3)
    reached = (fan_areas[:, 1] >= target) & valid
    last = jnp.maximum(vertex_count - 3, 0)
    sel = jnp.where(jnp.any(reached), jnp.argmax(reached), last)
    prev_cum = pick_lane(fan_areas[:, 1], sel - 1)  # 0 when sel == 0
    sub_area = target - prev_cum
    tri_area = pick_lane(fan_areas[:, 0], sel)
    v0 = pick_lane(verts_world, sel + 1)
    v1 = verts_world[0]
    v2 = pick_lane(verts_world, sel + 2)
    r0 = sub_area / jnp.where(tri_area != 0.0, tri_area, 1.0)
    sqrt_r0 = jnp.sqrt(jnp.maximum(r0, 0.0))
    b0 = 1.0 - sqrt_r0
    b1 = sqrt_r0 * rnd[1]
    b2 = -sqrt_r0 * rnd[1] + sqrt_r0
    return b0 * v0 + b1 * v1 + b2 * v2


def pairs_per_light(settings: RenderSettings) -> int:
    """Static noise-pair budget per light (matches the GLSL consumption)."""
    if settings.error_display != ErrorDisplay.NONE:
        return max(settings.sample_count, 1)
    per_sample = {
        SamplingStrategy.DIFFUSE_ONLY: 1,
        SamplingStrategy.DIFFUSE_GGX_MIS: 2,
        SamplingStrategy.DIFFUSE_SPECULAR_SEPARATELY: 2,
        SamplingStrategy.DIFFUSE_SPECULAR_MIS: 2,
        SamplingStrategy.DIFFUSE_SPECULAR_RANDOM: 1,
    }[settings.sampling_strategy]
    return settings.sample_count * per_sample
