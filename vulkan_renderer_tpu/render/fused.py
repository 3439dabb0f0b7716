"""Fused per-light shading: the whole clip -> PSA-prepare -> sample ->
estimate chain for a pixel tile in ONE Pallas kernel.

This is the TPU answer to the reference's shading megakernel
(shading_pass.frag.glsl:329-711, which runs the same chain per fragment
entirely in registers): the plain XLA pipeline materializes hundreds of
HBM intermediates between fusions, so the frame is HBM-bound at ~3-5
kflop/pixel/light. Here every intermediate lives in VMEM for an (TR, 128)
pixel tile; the math is the SoA library (ops/soa.py), which agrees with
the cited per-pixel reference implementations.

Coverage (static dispatch, like the reference's #define specialization):
- ALL 13 techniques with DIFFUSE_ONLY (the timing-sweep configuration;
  Arvo PSA via ops/soa_arvo_psa.py)
- the PSA pair additionally supports DIFFUSE_SPECULAR_MIS with all 5
  MIS heuristics
- untextured polygonal lights; no error display
Everything else (error displays, textured/IES lights, linear lights,
remaining strategies) falls back to the vmapped per-pixel pipeline —
`fused_supported` below is the authoritative predicate.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.settings import (ErrorDisplay, MisHeuristic,
                             PolygonSamplingTechnique, RenderSettings,
                             SamplingStrategy)
from ..ops import soa
from ..ops.soa import vadd, vscale, vwh, vdot, wh

_HEURISTIC_NAME = {
    MisHeuristic.BALANCE: "balance",
    MisHeuristic.POWER: "power",
    MisHeuristic.WEIGHTED: "weighted",
    MisHeuristic.OPTIMAL_CLAMPED: "optimal_clamped",
    MisHeuristic.OPTIMAL: "optimal",
}

# Per-light scalar record layout (SMEM row): 8 vertices x 3, plane (4),
# surface radiance (3), rotation columns (9), translation (3),
# scaling x/y (2), area (1), fan areas (6 x (tri, cumulative)).
_LS_VERTS = 0
_LS_PLANE = 24
_LS_RADIANCE = 28
_LS_ROTATION = 31
_LS_TRANSLATION = 40
_LS_SCALING = 43
_LS_AREA = 45
_LS_FAN = 46
_LIGHT_SCALARS = _LS_FAN + 6 * 2


def fused_supported(static, settings: RenderSettings) -> bool:
    """Whether this (static, settings) combination has a fused kernel.

    Coverage: ALL 13 techniques have a DIFFUSE_ONLY fused path (the
    timing-sweep configuration, experiment_list.c:364-409 — Arvo PSA via
    ops/soa_arvo_psa.py); the PSA pair additionally supports
    DIFFUSE_SPECULAR_MIS. Everything else (error displays, textured/IES
    lights, linear lights, remaining strategies) falls back to the
    vmapped per-pixel pipeline."""
    if settings.error_display != ErrorDisplay.NONE:
        return False
    psa = settings.polygon_sampling_technique in (
        PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE,
        PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE_BIASED)
    allowed = (SamplingStrategy.DIFFUSE_ONLY,
               SamplingStrategy.DIFFUSE_SPECULAR_MIS) if psa \
        else (SamplingStrategy.DIFFUSE_ONLY,)
    if settings.sampling_strategy not in allowed:
        return False
    if getattr(static, "linear_light_count", 0):
        return False
    if any(t != 0 for t in static.light_texturing):
        return False
    if static.light_vertex_counts is None:
        return False
    if len(static.light_vertex_counts) != static.light_count:
        return False
    # A count outside the 8-slot light record would make _read_light read
    # the SMEM plane/radiance scalars as vertex coordinates.
    if any(nv < 3 or nv > 8 for nv in static.light_vertex_counts):
        return False
    return True


def rays_per_light_fused(settings: RenderSettings) -> int:
    n = settings.sample_count
    if settings.sampling_strategy == SamplingStrategy.DIFFUSE_ONLY:
        return n
    return 2 * n


class _LightScalars(NamedTuple):
    """One light's traced scalars inside the kernel."""
    verts: list      # NV of vec3 scalar tuples
    plane: tuple     # (4,) scalars
    radiance: tuple  # (3,) scalars
    rot_cols: list   # 3 vec3 scalar tuples (rotation columns)
    translation: tuple
    scaling: tuple   # (scaling_x, scaling_y)
    area: object     # () scalar
    fan_tri: list    # 6 per-fan-triangle areas
    fan_cum: list    # 6 cumulative fan areas


def _affine(rows, trans, v):
    """rows: 3 vec3 plane tuples; trans: 3 planes; v: vec3 of scalars."""
    return tuple(vdot(rows[i], v) + trans[i] for i in range(3))


def _rot_t_apply(rows, d):
    """world dir = sum_i d[i] * rows[i] (rows are the shading axes)."""
    return tuple(d[0] * rows[0][c] + d[1] * rows[1][c] + d[2] * rows[2][c]
                 for c in range(3))


def _rad_brdf_soa(px, light: _LightScalars, d_world,
                  diffuse: bool = True, specular: bool = True):
    """Twin of render/shading.py radiance_brdf_deferred for untextured
    lights: (value_if_visible vec3, lambert, t_max)."""
    lambert = vdot(px["normal"], d_world)
    geo = lambert > 0.0
    pxyz = light.plane[:3]
    denom = (d_world[0] * pxyz[0] + d_world[1] * pxyz[1]
             + d_world[2] * pxyz[2])
    dist = (px["position"][0] * pxyz[0] + px["position"][1] * pxyz[1]
            + px["position"][2] * pxyz[2]) + light.plane[3]
    t_max = -dist / jnp.where(denom != 0.0, denom, 1.0)
    brdf = soa.evaluate_brdf_soa(
        px["normal"], px["outgoing"], px["lambert_out"],
        px["diffuse_albedo"], px["fresnel_0"], px["roughness"], d_world,
        diffuse, specular)
    zero = jnp.zeros_like(lambert)
    value = tuple(jnp.where(geo, light.radiance[c] * brdf[c], 0.0)
                  for c in range(3))
    return value, lambert, jnp.where(geo, t_max, zero)


def _unflipped_rows(px, prefix):
    rows = [tuple(px[f"{prefix}{i}{j}"] for j in range(3)) for i in range(3)]
    trans = [px[f"{prefix}{i}3"] for i in range(3)]
    return rows, trans


def _shade_one_light_diffuse(px, light: _LightScalars, nv: int,
                             settings: RenderSettings, noise):
    """DIFFUSE_ONLY shading for the non-PSA techniques (the reference's
    per-technique branches, shading_pass.frag.glsl:329-502, in SoA form —
    see ops/soa_techniques.py for the per-technique ports)."""
    from ..ops import soa_techniques as st
    tech = settings.polygon_sampling_technique
    n = settings.sample_count
    zero = jnp.zeros_like(px["roughness"])
    zero3 = (zero, zero, zero)

    prep = None
    ok = None
    density_const = None
    if tech == PolygonSamplingTechnique.BASELINE:
        corner = tuple(light.translation[c] - px["position"][c]
                       for c in range(3))

        def sample(r0, r1):
            d = soa.vnormalize(tuple(
                corner[c] + r0 * light.rot_cols[0][c]
                + r1 * light.rot_cols[1][c] for c in range(3)))
            return d, jnp.ones_like(r0)
    elif tech == PolygonSamplingTechnique.AREA_TURK:
        def sample(r0, r1):
            pos = st.sample_area_turk_soa(light.verts, light.fan_tri,
                                          light.fan_cum, nv, r0, r1)
            offset = tuple(pos[c] - px["position"][c] for c in range(3))
            dist_sq = vdot(offset, offset)
            rcp = 1.0 / jnp.sqrt(dist_sq)
            d = tuple(offset[c] * rcp for c in range(3))
            pxyz = light.plane[:3]
            projected = jnp.abs(d[0] * pxyz[0] + d[1] * pxyz[1]
                                + d[2] * pxyz[2]) * light.area
            density = dist_sq / jnp.where(projected > 0.0, projected, 1.0)
            density = jnp.where(projected > 0.0, density, 0.0)
            return d, density
    elif tech in (PolygonSamplingTechnique.SOLID_ANGLE,
                  PolygonSamplingTechnique.SOLID_ANGLE_ARVO):
        dirs = [soa.vnormalize(tuple(light.verts[k][c] - px["position"][c]
                                     for c in range(3)))
                for k in range(nv)]
        arvo = tech == PolygonSamplingTechnique.SOLID_ANGLE_ARVO
        prep = st.prepare_sa_arvo_soa(dirs, None, nv) if arvo \
            else st.prepare_sa_soa(dirs, None, nv)
        ok = prep.solid_angle > 0.0
        density_const = 1.0 / jnp.where(ok, prep.solid_angle, 1.0)

        def sample(r0, r1):
            d = st.sample_sa_arvo_soa(prep, r0, r1, nv) if arvo \
                else st.sample_sa_soa(prep, r0, r1, nv)
            return d, density_const
    elif tech == PolygonSamplingTechnique.RECTANGLE_SOLID_ANGLE_URENA:
        prep = st.prepare_urena_soa(
            light.translation, light.scaling[0], light.scaling[1],
            light.rot_cols[0], light.rot_cols[1], light.rot_cols[2],
            px["position"])
        ok = prep.solid_angle > 0.0
        density_const = 1.0 / jnp.where(ok, prep.solid_angle, 1.0)

        def sample(r0, r1):
            return st.sample_urena_soa(prep, r0, r1), density_const
    else:
        # Shading-space family: clipped solid angle + the Hart warps
        # (render/shading.py:501-556). NO winding flip here (PSA only).
        rows, trans = _unflipped_rows(px, "w2s")
        verts_shading = [_affine(rows, trans, light.verts[k])
                         for k in range(nv)]
        no_clip = tech in (
            PolygonSamplingTechnique.BILINEAR_COSINE_WARP_HART,
            PolygonSamplingTechnique.BIQUADRATIC_COSINE_WARP_HART)
        if no_clip:
            verts, count, m = verts_shading, None, nv
            clip_ok = None
        else:
            verts, count = soa.clip_soa(verts_shading, nv)
            m = nv + 1
            clip_ok = count > 0
        dirs = [soa.vnormalize(v) for v in verts]
        if tech == PolygonSamplingTechnique.CLIPPED_SOLID_ANGLE:
            prep = st.prepare_sa_soa(
                dirs, None if count is None else jnp.maximum(count, 3), m)
            ok = prep.solid_angle > 0.0
            if clip_ok is not None:
                ok = ok & clip_ok
            density_const = 1.0 / jnp.where(prep.solid_angle > 0.0,
                                            prep.solid_angle, 1.0)

            def sample_sh(r0, r1):
                return st.sample_sa_soa(prep, r0, r1, m), density_const
        else:
            bilinear = tech in (
                PolygonSamplingTechnique.BILINEAR_COSINE_WARP_HART,
                PolygonSamplingTechnique.BILINEAR_COSINE_WARP_CLIPPING_HART)
            cnt = None if count is None else jnp.maximum(count, 3)
            if bilinear:
                prep = st.prepare_hart_bilinear_soa(dirs, cnt, m)

                def sample_sh(r0, r1):
                    return st.sample_hart_bilinear_soa(prep, r0, r1, m)
            else:
                prep = st.prepare_hart_biquadratic_soa(dirs, cnt, m)

                def sample_sh(r0, r1):
                    return st.sample_hart_biquadratic_soa(prep, r0, r1, m)
            ok = prep.poly.solid_angle > 0.0
            if clip_ok is not None:
                ok = ok & clip_ok

        def sample(r0, r1):
            d_sh, density = sample_sh(r0, r1)
            return _rot_t_apply(rows, d_sh), density

    base = zero3
    slots = []
    for s in range(n):
        r0, r1 = noise[s]
        d_world, density = sample(r0, r1)
        value1, lambert, t_max = _rad_brdf_soa(px, light, d_world)
        scale = jnp.where(density > 0.0,
                          lambert / jnp.where(density > 0.0, density, 1.0),
                          0.0)
        gate = px["hit"] if ok is None else (ok & px["hit"])
        b = vwh(gate, vscale(scale, value1), zero3)
        slots.append((b, d_world, t_max))
    inv_n = np.float32(1.0 / n)
    return base, [(vscale(inv_n, b), d, t) for (b, d, t) in slots]


def _shade_one_light_arvo_psa(px, light: _LightScalars, nv: int,
                              settings: RenderSettings, noise):
    """DIFFUSE_ONLY Arvo PSA (related-work baseline), SoA twin of the
    vmapped branch in render/shading.py (one_sample_arvo; reference
    polygon_sampling_related_work.glsl:509-992). Like the PSA pair it
    flips the shading frame's y when the shading point is behind the
    light plane (shading_pass.frag.glsl:444-452)."""
    from ..ops.soa_arvo_psa import prepare_arvo_psa_soa, sample_arvo_psa_soa
    n = settings.sample_count
    side = (vdot(px["position"], light.plane[:3]) + light.plane[3])
    flip = jnp.where(side < 0.0, np.float32(-1.0), np.float32(1.0))
    rows = [tuple(px[f"w2s{i}{j}"] for j in range(3)) for i in range(3)]
    trans = [px[f"w2s{i}3"] for i in range(3)]
    rows[1] = tuple(flip * c for c in rows[1])
    trans[1] = flip * trans[1]

    verts_shading = [_affine(rows, trans, light.verts[k])
                     for k in range(nv)]
    clipped, ccount = soa.clip_soa(verts_shading, nv)
    poly = prepare_arvo_psa_soa(clipped, ccount, nv + 1)
    psa = poly.psa
    diffuse_ok = (ccount > 0) & (psa > 0.0)
    rcp_psa = 1.0 / jnp.where(psa > 0.0, psa, 1.0)

    zero = jnp.zeros_like(psa)
    zero3 = (zero, zero, zero)
    slots = []
    for s in range(n):
        r0, r1 = noise[s]
        d_sh = sample_arvo_psa_soa(poly, r0, r1, 3)
        density = d_sh[2] * rcp_psa
        d_world = _rot_t_apply(rows, d_sh)
        value1, lambert, t_max = _rad_brdf_soa(px, light, d_world)
        scale = jnp.where(density > 0.0,
                          lambert / jnp.where(density > 0.0, density, 1.0),
                          0.0)
        # Horizon samples (z <= 1e-5) are dropped: fp32 fireflies, same
        # deviation as the vmapped path (render/shading.py one_sample_arvo).
        gate = diffuse_ok & px["hit"] & (d_sh[2] > np.float32(1e-5))
        b = vwh(gate, vscale(scale, value1), zero3)
        slots.append((b, d_world, t_max))
    inv_n = np.float32(1.0 / n)
    return zero3, [(vscale(inv_n, b), d, t) for (b, d, t) in slots]


def _shade_one_light(px, light: _LightScalars, nv: int,
                     settings: RenderSettings, mis_visibility_estimate,
                     noise):
    """Shade one untextured polygonal light for a pixel tile.

    px: dict of planes (see _pack_planes). noise: list of (r0, r1) plane
    pairs, one per noise pair slot for this light. Returns
    (base vec3, [per ray slot (b vec3, dir vec3, t_max)])."""
    if settings.polygon_sampling_technique \
            == PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE_ARVO:
        return _shade_one_light_arvo_psa(px, light, nv, settings, noise)
    if settings.polygon_sampling_technique not in (
            PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE,
            PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE_BIASED):
        return _shade_one_light_diffuse(px, light, nv, settings, noise)
    biased = (settings.polygon_sampling_technique
              == PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE_BIASED)
    strategy = settings.sampling_strategy
    heuristic = _HEURISTIC_NAME[settings.mis_heuristic]
    n = settings.sample_count

    # Winding flip when the shading point is behind the light plane
    # (shading_pass.frag.glsl:444-452).
    side = (vdot(px["position"], light.plane[:3]) + light.plane[3])
    flip = jnp.where(side < 0.0, np.float32(-1.0), np.float32(1.0))

    def flipped_rows(prefix):
        rows = [tuple(px[f"{prefix}{i}{j}"] for j in range(3))
                for i in range(3)]
        trans = [px[f"{prefix}{i}3"] for i in range(3)]
        rows[1] = tuple(flip * c for c in rows[1])
        trans[1] = flip * trans[1]
        return rows, trans

    w2s_rows, w2s_trans = flipped_rows("w2s")
    verts_shading = [_affine(w2s_rows, w2s_trans, light.verts[k])
                     for k in range(nv)]
    clipped, ccount = soa.clip_soa(verts_shading, nv)
    poly_d = soa.prepare_psa_soa(clipped, ccount, nv + 1, biased)
    psa_d = poly_d.psa
    diffuse_ok = (ccount > 0) & (psa_d > 0.0)
    rcp_psa_d = 1.0 / jnp.where(psa_d > 0.0, psa_d, 1.0)

    zero = jnp.zeros_like(psa_d)
    zero3 = (zero, zero, zero)
    base = zero3
    slots = []

    if strategy == SamplingStrategy.DIFFUSE_ONLY:
        for s in range(n):
            r0, r1 = noise[s]
            d_sh = soa.sample_psa_soa(poly_d, r0, r1, biased)
            density = d_sh[2] * rcp_psa_d
            d_world = _rot_t_apply(w2s_rows, d_sh)
            value1, lambert, t_max = _rad_brdf_soa(px, light, d_world)
            scale = jnp.where(density > 0.0,
                              lambert / jnp.where(density > 0.0, density,
                                                  1.0), 0.0)
            b = vscale(scale, value1)
            b = vwh(diffuse_ok & px["hit"], b, zero3)
            slots.append((b, d_world, t_max))
    else:
        # DIFFUSE_SPECULAR_MIS (shading_pass.frag.glsl:506-670).
        w2c_rows, w2c_trans = flipped_rows("w2c")
        verts_cosine = [_affine(w2c_rows, w2c_trans, light.verts[k])
                        for k in range(nv)]
        clipped_c, ccount_c = soa.clip_soa(verts_cosine, nv)
        poly_s = soa.prepare_psa_soa(clipped_c, ccount_c, nv + 1, biased)
        psa_s = jnp.where(ccount_c > 0, poly_s.psa, 0.0)
        specular_ok = psa_s > 0.0
        rcp_psa_s = 1.0 / jnp.where(psa_s > 0.0, psa_s, 1.0)
        specular_albedo = px["ltc_albedo"]
        specular_weight = specular_albedo * psa_s

        diffuse_albedo = tuple(jnp.maximum(px["diffuse_albedo"][c], 0.01)
                               for c in range(3))
        diffuse_weight = tuple(diffuse_albedo[c] * psa_d for c in range(3))
        specular_weight3 = (specular_weight,) * 3
        if settings.mis_heuristic == MisHeuristic.OPTIMAL:
            inv_pi = np.float32(1.0 / np.pi)
            rad_over_pi = tuple(light.radiance[c] * inv_pi
                                for c in range(3))
            diffuse_weight = tuple(diffuse_weight[c] * rad_over_pi[c]
                                   for c in range(3))
            specular_weight3 = tuple(specular_weight3[c] * rad_over_pi[c]
                                     for c in range(3))

        s2c = [px[f"s2c{i}{j}"] for i in range(3) for j in range(3)]
        c2s = [px[f"c2s{i}{j}"] for i in range(3) for j in range(3)]
        det = px["ltc_det"]

        for s in range(n):
            d_diffuse = soa.sample_psa_soa(poly_d, noise[2 * s][0],
                                           noise[2 * s][1], biased)
            d_spec_c = soa.sample_psa_soa(poly_s, noise[2 * s + 1][0],
                                          noise[2 * s + 1][1], biased)
            d_specular = soa.vnormalize(tuple(
                c2s[3 * i + 0] * d_spec_c[0] + c2s[3 * i + 1] * d_spec_c[1]
                + c2s[3 * i + 2] * d_spec_c[2] for i in range(3)))
            for j, d_sh in enumerate((d_diffuse, d_specular)):
                in_upper = d_sh[2] > 0.0
                diffuse_density = d_sh[2] * rcp_psa_d
                specular_density = soa.ltc_density_soa(s2c, det, d_sh,
                                                       rcp_psa_s)
                d_world = _rot_t_apply(w2s_rows, d_sh)
                value1, _, t_max = _rad_brdf_soa(px, light, d_world)
                integrand1 = vscale(d_sh[2], value1)
                if j == 0:
                    weights = (diffuse_weight, diffuse_density,
                               specular_weight3, specular_density)
                else:
                    weights = (specular_weight3, specular_density,
                               diffuse_weight, diffuse_density)
                est0 = soa.mis_estimate_soa(
                    heuristic, zero3, *weights, mis_visibility_estimate)
                est1 = soa.mis_estimate_soa(
                    heuristic, integrand1, *weights,
                    mis_visibility_estimate)
                est_delta = tuple(est1[c] - est0[c] for c in range(3))
                if j == 0:
                    dd_safe = jnp.where(diffuse_density > 0.0,
                                        diffuse_density, 1.0)
                    no_mis1 = vscale(1.0 / dd_safe, integrand1)
                    a_term = vwh(specular_ok, est0, zero3)
                    b_term = vwh(specular_ok, est_delta, no_mis1)
                    gate = in_upper & diffuse_ok
                else:
                    a_term = est0
                    b_term = est_delta
                    gate = in_upper & diffuse_ok & specular_ok
                gate = gate & px["hit"]
                base = vadd(base, vwh(gate, a_term, zero3))
                slots.append((vwh(gate, b_term, zero3), d_world, t_max))

    scale = np.float32(1.0 / n)
    base = vscale(scale, base)
    slots = [(vscale(scale, b), d, t) for (b, d, t) in slots]
    return base, slots


# ---------------------------------------------------------------------------
# Plane packing
# ---------------------------------------------------------------------------

_BASE_PLANES = (
    ["pos0", "pos1", "pos2", "nrm0", "nrm1", "nrm2", "out0", "out1", "out2",
     "lambert_out", "alb0", "alb1", "alb2", "f00", "f01", "f02", "rough",
     "hit", "ltc_albedo", "ltc_det"]
    + [f"w2s{i}{j}" for i in range(3) for j in range(4)]
    + [f"w2c{i}{j}" for i in range(3) for j in range(4)]
    + [f"s2c{i}{j}" for i in range(3) for j in range(3)]
    + [f"c2s{i}{j}" for i in range(3) for j in range(3)]
)


def _unpack_px(planes):
    """planes: (NIN, ...) array -> dict for _shade_one_light."""
    idx = {name: k for k, name in enumerate(_BASE_PLANES)}

    def g(name):
        return planes[idx[name]]

    px = {
        "position": (g("pos0"), g("pos1"), g("pos2")),
        "normal": (g("nrm0"), g("nrm1"), g("nrm2")),
        "outgoing": (g("out0"), g("out1"), g("out2")),
        "lambert_out": g("lambert_out"),
        "diffuse_albedo": (g("alb0"), g("alb1"), g("alb2")),
        "fresnel_0": (g("f00"), g("f01"), g("f02")),
        "roughness": g("rough"),
        "hit": g("hit") > 0.5,
        "ltc_albedo": g("ltc_albedo"),
        "ltc_det": g("ltc_det"),
    }
    for i in range(3):
        for j in range(4):
            px[f"w2s{i}{j}"] = g(f"w2s{i}{j}")
            px[f"w2c{i}{j}"] = g(f"w2c{i}{j}")
        for j in range(3):
            px[f"s2c{i}{j}"] = g(f"s2c{i}{j}")
            px[f"c2s{i}{j}"] = g(f"c2s{i}{j}")
    return px


def _pack_planes(data, ltc, hit, noise_pairs):
    """Stack per-pixel inputs into one (NIN, P) array.

    data: ShadingData with (P, ...) leaves; ltc: LtcCoefficients with
    (P, ...) leaves; hit: (P,) bool; noise_pairs: (P, PAIRS, 2)."""
    cols = [
        data.position[:, 0], data.position[:, 1], data.position[:, 2],
        data.normal[:, 0], data.normal[:, 1], data.normal[:, 2],
        data.outgoing[:, 0], data.outgoing[:, 1], data.outgoing[:, 2],
        data.lambert_outgoing,
        data.diffuse_albedo[:, 0], data.diffuse_albedo[:, 1],
        data.diffuse_albedo[:, 2],
        data.fresnel_0[:, 0], data.fresnel_0[:, 1], data.fresnel_0[:, 2],
        data.roughness,
        hit.astype(jnp.float32),
        ltc.albedo,
        ltc.shading_to_cosine_space_determinant,
    ]
    for i in range(3):
        for j in range(4):
            cols.append(ltc.world_to_shading_space[:, i, j])
    for i in range(3):
        for j in range(4):
            cols.append(ltc.world_to_cosine_space[:, i, j])
    for i in range(3):
        for j in range(3):
            cols.append(ltc.shading_to_cosine_space[:, i, j])
    for i in range(3):
        for j in range(3):
            cols.append(ltc.cosine_to_shading_space[:, i, j])
    pairs = noise_pairs.shape[1]
    for p in range(pairs):
        cols.append(noise_pairs[:, p, 0])
        cols.append(noise_pairs[:, p, 1])
    return jnp.stack(cols, axis=0)


def _pack_light_scalars(lights, light_count: int):
    """(L, _LIGHT_SCALARS) f32 array of traced per-light scalars."""
    rows = []
    for i in range(light_count):
        verts = lights.vertices_world_space[i]  # (MAXL, 3)
        maxl = verts.shape[0]
        pad = 8 - maxl
        if pad > 0:
            verts = jnp.concatenate(
                [verts, jnp.broadcast_to(verts[0], (pad, 3))], axis=0)
        fan = lights.fan_areas[i]  # (MAXL-2, 2)
        fan_pad = 6 - fan.shape[0]
        if fan_pad > 0:
            fan = jnp.concatenate(
                [fan, jnp.broadcast_to(fan[-1], (fan_pad, 2))], axis=0)
        rows.append(jnp.concatenate([
            verts[:8].reshape(-1), lights.plane[i],
            lights.surface_radiance[i],
            # Columns flattened: rotation[:, 0], rotation[:, 1], [:, 2].
            lights.rotation[i].T.reshape(-1),
            lights.translation[i],
            jnp.stack([lights.scaling_x[i], lights.scaling_y[i]]),
            lights.area[i][None],
            fan[:6].reshape(-1)]))
    return jnp.stack(rows, axis=0)


def _read_light(ls_ref, i: int, nv: int) -> _LightScalars:
    verts = [tuple(ls_ref[i, 3 * k + c] for c in range(3))
             for k in range(nv)]
    plane = tuple(ls_ref[i, _LS_PLANE + c] for c in range(4))
    radiance = tuple(ls_ref[i, _LS_RADIANCE + c] for c in range(3))
    rot_cols = [tuple(ls_ref[i, _LS_ROTATION + 3 * k + c]
                      for c in range(3)) for k in range(3)]
    translation = tuple(ls_ref[i, _LS_TRANSLATION + c] for c in range(3))
    scaling = (ls_ref[i, _LS_SCALING], ls_ref[i, _LS_SCALING + 1])
    area = ls_ref[i, _LS_AREA]
    fan_tri = [ls_ref[i, _LS_FAN + 2 * k] for k in range(6)]
    fan_cum = [ls_ref[i, _LS_FAN + 2 * k + 1] for k in range(6)]
    return _LightScalars(verts=verts, plane=plane, radiance=radiance,
                         rot_cols=rot_cols, translation=translation,
                         scaling=scaling, area=area, fan_tri=fan_tri,
                         fan_cum=fan_cum)


def _shade_tile(planes, ls_read, static, settings: RenderSettings,
                mis_visibility_estimate):
    """Shared tile body: planes (NIN, ...) -> (NOUT, ...) stacked outputs.

    ls_read: callable (i, nv) -> _LightScalars."""
    px = _unpack_px(planes)
    n_base = len(_BASE_PLANES)
    ppl = 2 * settings.sample_count \
        if settings.sampling_strategy == SamplingStrategy.DIFFUSE_SPECULAR_MIS \
        else settings.sample_count

    base = (jnp.zeros_like(px["roughness"]),) * 3
    out_slots = []
    for i in range(static.light_count):
        nv = static.light_vertex_counts[i]
        light = ls_read(i, nv)
        noise = []
        for p in range(ppl):
            k = n_base + 2 * (i * ppl + p)
            noise.append((planes[k], planes[k + 1]))
        lbase, slots = _shade_one_light(px, light, nv, settings,
                                        mis_visibility_estimate, noise)
        base = vadd(base, lbase)
        out_slots.extend(slots)

    outs = list(base)
    for (b, d, t) in out_slots:
        outs.extend([b[0], b[1], b[2], d[0], d[1], d[2], t])
    return jnp.stack(outs, axis=0)


@functools.partial(jax.jit, static_argnames=("static", "settings",
                                             "interpret", "tile_rows"))
def fused_light_shading(data, ltc, hit, noise_pairs, light_scalars,
                        mis_visibility_estimate, static,
                        settings: RenderSettings, interpret: bool = False,
                        tile_rows: int = 32):
    """Run the fused kernel over all pixels.

    data/ltc: vmapped ShadingData / LtcCoefficients with (P, ...) leaves;
    hit: (P,) bool; noise_pairs: (P, PAIRS, 2);
    light_scalars: (L, _LIGHT_SCALARS) from _pack_light_scalars.
    Returns (base (P, 3), b (P, S, 3), dirs (P, S, 3), t_max (P, S)) with
    S = light_count * rays_per_light_fused(settings).

    tile_rows: each SoA plane op covers a (tile_rows, 128) VMEM block.
    At 8 rows every op is a single VPU register's worth of work and the
    kernel is instruction-issue-bound: measured on v5e at the flagship
    config, 141 ms/frame at tile_rows=8 vs 31 ms at 32 (128 is the same
    31 ms with 4x the VMEM) — the default 32 amortizes issue cost 4x."""
    planes = _pack_planes(data, ltc, hit, noise_pairs)
    nin, p = planes.shape
    s_total = static.light_count * rays_per_light_fused(settings)
    nout = 3 + 7 * s_total

    lane = 128
    chunk = tile_rows * lane
    p_pad = -(-p // chunk) * chunk
    if p_pad != p:
        planes = jnp.concatenate(
            [planes, jnp.zeros((nin, p_pad - p), planes.dtype)], axis=1)
    rows = p_pad // lane
    planes = planes.reshape(nin, rows, lane)

    grid = (rows // tile_rows,)

    # mis_visibility_estimate is a traced scalar; route it through SMEM.
    mis_arr = jnp.reshape(jnp.asarray(mis_visibility_estimate,
                                      jnp.float32), (1, 1))

    def kernel2(planes_ref, ls_ref, mis_ref, out_ref):
        def ls_read(i, nv):
            return _read_light(ls_ref, i, nv)
        out_ref[...] = _shade_tile(planes_ref[...], ls_read, static,
                                   settings, mis_ref[0, 0])

    out = pl.pallas_call(
        kernel2,
        out_shape=jax.ShapeDtypeStruct((nout, rows, lane), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nin, tile_rows, lane), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(light_scalars.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((nout, tile_rows, lane), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(planes, light_scalars, mis_arr)

    out = out.reshape(nout, p_pad)[:, :p]
    base = out[0:3].T
    rest = out[3:].reshape(s_total, 7, p)
    b = rest[:, 0:3].transpose(2, 0, 1)
    dirs = rest[:, 3:6].transpose(2, 0, 1)
    t_max = rest[:, 6].T
    return base, b, dirs, t_max


def fused_resolved_supported(static, settings: RenderSettings) -> bool:
    """Whether the resolved (no-shadow) light-grid kernel applies: the
    estimator is affine in visibility, so with trace_shadow_rays=False
    every ray slot resolves to V=1 and the kernel can accumulate color
    in-register instead of exporting 7 planes per ray slot. The light
    axis becomes a grid dimension (one light per step), so the 128-light
    timing-sweep cases (experiment_list.c:364-409) compile O(1) in light
    count. Mixed vertex counts run as one kernel launch per distinct nv
    over that group's lights (the per-step body is specialized on a
    static nv; grid order inside a group is free because the per-light
    contributions just sum)."""
    if settings.trace_shadow_rays:
        return False
    return fused_supported(static, settings)


@functools.partial(jax.jit, static_argnames=("static", "settings",
                                             "interpret", "tile_rows",
                                             "spp_chunk"))
def fused_light_shading_resolved(data, ltc, hit, noise_pairs, light_scalars,
                                 mis_visibility_estimate, static,
                                 settings: RenderSettings,
                                 interpret: bool = False,
                                 tile_rows: int = 32,
                                 spp_chunk: int | None = None):
    """Fused shading with visibility resolved to 1 (no shadow rays).

    Grid (pixel tiles, lights x sample chunks): each step shades ONE
    light with ONE chunk of samples for one tile and accumulates into a
    3-plane output block (revisited across the innermost grid dimension).
    Per-light scalars are read from SMEM at the traced light index;
    per-chunk noise planes arrive via the BlockSpec index map. Mixed
    vertex counts run one launch per distinct nv over that group's
    lights (contributions sum, so splitting the light axis across
    launches is exact). Returns base (P, 3).

    spp_chunk: samples unrolled per grid step. The per-sample estimates
    are independent in every strategy and _shade_one_light returns
    (1/sample_count)-scaled sums, so running n/spp_chunk grid steps and
    weighting each by spp_chunk/n is the same estimator (fp sum order
    aside). Default: sample_count (one step, no re-prepare cost) except
    for Arvo PSA, whose per-sample body is so large that 128 unrolled
    copies take the Mosaic compiler >15 min (timing sweep case
    experiment_list.c:388 at 128 spp); there chunks of <=8 keep compile
    time bounded while the grid supplies the other 16x."""
    # Equals render/shading.py pairs_per_light for the fused strategies.
    ppl = rays_per_light_fused(settings)
    n = settings.sample_count
    if spp_chunk is None:
        spp_chunk = n
        if (settings.polygon_sampling_technique
                == PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE_ARVO
                and n > 8):
            spp_chunk = next(c for c in range(8, 0, -1) if n % c == 0)
    if n % spp_chunk != 0:
        raise ValueError(f"spp_chunk {spp_chunk} must divide "
                         f"sample_count {n}")
    n_chunks = n // spp_chunk
    kset = dataclasses.replace(settings, sample_count=spp_chunk) \
        if n_chunks > 1 else settings
    cppl = ppl // n_chunks
    n_lights = static.light_count
    p = data.roughness.shape[0]

    planes = _pack_planes(data, ltc, hit, noise_pairs[:, :0])
    nin = planes.shape[0]
    # (P, L*ppl, 2) -> (L, 2*ppl, P): light-major noise planes.
    noise = noise_pairs.reshape(p, n_lights, ppl, 2) \
        .transpose(1, 2, 3, 0).reshape(n_lights, 2 * ppl, p)

    lane = 128
    chunk = tile_rows * lane
    p_pad = -(-p // chunk) * chunk
    if p_pad != p:
        planes = jnp.concatenate(
            [planes, jnp.zeros((nin, p_pad - p), planes.dtype)], axis=1)
        noise = jnp.concatenate(
            [noise, jnp.zeros((n_lights, 2 * ppl, p_pad - p), noise.dtype)],
            axis=2)
    rows = p_pad // lane
    planes = planes.reshape(nin, rows, lane)
    noise = noise.reshape(n_lights, 2 * ppl, rows, lane)

    mis_arr = jnp.reshape(jnp.asarray(mis_visibility_estimate,
                                      jnp.float32), (1, 1))

    def one_group(nv: int, noise_g, ls_g):
        ng = ls_g.shape[0]
        if n_chunks > 1:
            # Light-major noise pairs are contiguous per light, so the
            # chunk split is a free reshape: step li covers light
            # li // n_chunks, sample chunk li % n_chunks.
            noise_g = noise_g.reshape(ng * n_chunks, 2 * cppl, rows, lane)

        def kernel(planes_ref, noise_ref, ls_ref, mis_ref, out_ref):
            li = pl.program_id(1)

            @pl.when(li == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            px = _unpack_px(planes_ref[...])
            light = _read_light(ls_ref, li // n_chunks, nv)
            pair_planes = [(noise_ref[0, 2 * q], noise_ref[0, 2 * q + 1])
                           for q in range(cppl)]
            lbase, slots = _shade_one_light(px, light, nv, kset,
                                            mis_ref[0, 0], pair_planes)
            total = lbase
            for (b, _, _) in slots:
                total = vadd(total, b)
            if n_chunks > 1:
                total = vscale(np.float32(1.0 / n_chunks), total)
            out_ref[...] += jnp.stack([total[0], total[1], total[2]],
                                      axis=0)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3, rows, lane), jnp.float32),
            grid=(rows // tile_rows, ng * n_chunks),
            in_specs=[
                pl.BlockSpec((nin, tile_rows, lane),
                             lambda i, li: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * cppl, tile_rows, lane),
                             lambda i, li: (li, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(ls_g.shape, lambda i, li: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i, li: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((3, tile_rows, lane),
                                   lambda i, li: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(planes, noise_g, ls_g, mis_arr)

    groups: dict[int, list[int]] = {}
    for i, nv in enumerate(static.light_vertex_counts):
        groups.setdefault(nv, []).append(i)
    out = None
    for nv, idx in sorted(groups.items()):
        if idx == list(range(n_lights)):
            noise_g, ls_g = noise, light_scalars
        else:
            sel = jnp.asarray(idx, jnp.int32)
            noise_g = noise[sel]
            ls_g = light_scalars[sel]
        g = one_group(nv, noise_g, ls_g)
        out = g if out is None else out + g

    return out.reshape(3, p_pad)[:, :p].T


def fused_light_shading_xla(data, ltc, hit, noise_pairs, light_scalars,
                            mis_visibility_estimate, static,
                            settings: RenderSettings):
    """Same SoA math WITHOUT Pallas (plain XLA) — CPU test/reference path."""
    planes = _pack_planes(data, ltc, hit, noise_pairs)
    _, p = planes.shape
    s_total = static.light_count * rays_per_light_fused(settings)

    def ls_read(i, nv):
        return _read_light(light_scalars, i, nv)

    out = _shade_tile(planes, ls_read, static, settings,
                      jnp.asarray(mis_visibility_estimate, jnp.float32))
    base = out[0:3].T
    rest = out[3:].reshape(s_total, 7, p)
    b = rest[:, 0:3].transpose(2, 0, 1)
    dirs = rest[:, 3:6].transpose(2, 0, 1)
    t_max = rest[:, 6].T
    return base, b, dirs, t_max
