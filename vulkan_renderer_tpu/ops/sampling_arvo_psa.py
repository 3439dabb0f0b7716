"""Arvo's projected solid angle sampling (the related-work baseline).

TPU re-implementation of polygon_sampling_related_work.glsl:509-992 (Arvo
2001, "Stratified Sampling of 2-Manifolds"): per-edge azimuth CDFs with a
cubic-interpolation initialization and Newton iterations. Needed for the
paper's comparison experiments; slower and less stable than ops/sampling's
method by design.

Same vectorization strategy as ops/sampling.py: fixed MAXV lanes, masked
selection scans, azimuth argsort instead of sorting networks, cached
per-sector inner/outer edge state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import MAX_POLYGON_VERTEX_COUNT as MAXV
from .math_utils import (F32, M_PI, mix_fma, normalize, pick_lane,
                         positive_atan)
from .sampling import rotate_90


class ProjectedSolidAnglePolygonArvo(NamedTuple):
    vertex_count: jnp.ndarray      # ()
    vertex_azimuths: jnp.ndarray   # (MAXV,)
    # Edges as structure-of-arrays (cdf_factor, length_coeffs, elevations).
    edge_cdf: jnp.ndarray          # (MAXV,)
    edge_len: jnp.ndarray          # (MAXV, 2)
    edge_elev: jnp.ndarray         # (MAXV, 2)
    inner_cdf: jnp.ndarray         # ()
    inner_len: jnp.ndarray         # (2,)
    inner_elev: jnp.ndarray        # (2,)
    inner_azimuth: jnp.ndarray     # ()
    # Cached decentral per-sector state.
    sector_inner_cdf: jnp.ndarray  # (MAXV,)
    sector_inner_len: jnp.ndarray  # (MAXV, 2)
    sector_inner_elev: jnp.ndarray  # (MAXV, 2)
    sector_inner_azimuth: jnp.ndarray  # (MAXV,)
    sector_outer_cdf: jnp.ndarray
    sector_outer_len: jnp.ndarray
    sector_outer_elev: jnp.ndarray
    sector_outer_azimuth: jnp.ndarray
    sector_psa: jnp.ndarray        # (MAXV,)
    projected_solid_angle: jnp.ndarray  # ()


def _prepare_edge(vertex_0, vertex_1):
    """prepare_edge_arvo (glsl:559-590); vectorized over leading dims."""
    normal_a = normalize(jnp.cross(vertex_0, vertex_1))
    cdf = 0.5 * normal_a[..., 2]
    ccw = jnp.where((cdf > 0.0)[..., None], vertex_0, vertex_1)
    normal_c = rotate_90(normalize(ccw[..., :2]))
    cos_beta = -jnp.sum(normal_a[..., :2] * normal_c, axis=-1)
    sin_beta_sq = -cos_beta * cos_beta + 1.0
    csc_beta = 1.0 / jnp.sqrt(jnp.maximum(0.0, sin_beta_sq) + 1e-30)
    csc_c = 1.0 / jnp.sqrt(jnp.maximum(
        0.0, -ccw[..., 2] * ccw[..., 2] + 1.0) + 1e-30)
    len0 = sin_beta_sq
    len1 = jnp.sum(normal_a[..., :2] * rotate_90(normal_c), axis=-1) * cos_beta
    length_coeffs = jnp.stack([len0, len1], axis=-1) \
        * (csc_beta * csc_c)[..., None]
    elev0 = ccw[..., 2]
    elev1 = jnp.cross(ccw, normal_a)[..., 2]
    elev1 = jnp.where(cdf > 0.0, -elev1, elev1)
    return cdf, length_coeffs, jnp.stack([elev0, elev1], axis=-1)


def _edge_psa_in_sector(cdf, length_coeffs, rel_azimuth_0, rel_azimuth_1):
    """get_edge_projected_solid_angle_in_sector_arvo (glsl:600-612)."""
    dir_0 = jnp.stack([jnp.cos(rel_azimuth_0), jnp.sin(rel_azimuth_0)], -1)
    p0 = jnp.stack([jnp.sum(length_coeffs * dir_0, -1), dir_0[..., 1]], -1)
    dir_1 = jnp.stack([jnp.cos(rel_azimuth_1), jnp.sin(rel_azimuth_1)], -1)
    p1 = jnp.stack([jnp.sum(length_coeffs * dir_1, -1), dir_1[..., 1]], -1)
    rx = p0[..., 0] * p1[..., 0] + p0[..., 1] * p1[..., 1]
    ry = p0[..., 0] * p1[..., 1] - p0[..., 1] * p1[..., 0]
    length = positive_atan(jnp.abs(ry) / rx)
    return cdf * length


def _edge_psa_and_derivative(cdf, length_coeffs, rel_azimuth_0, rel_azimuth_1):
    """glsl:617-642: (psa, d psa / d rel_azimuth_1)."""
    dir_0 = jnp.stack([jnp.cos(rel_azimuth_0), jnp.sin(rel_azimuth_0)], -1)
    p0 = jnp.stack([jnp.sum(length_coeffs * dir_0, -1), dir_0[..., 1]], -1)
    dir_1 = jnp.stack([jnp.cos(rel_azimuth_1), jnp.sin(rel_azimuth_1)], -1)
    p1 = jnp.stack([jnp.sum(length_coeffs * dir_1, -1), dir_1[..., 1]], -1)
    rx = p0[..., 0] * p1[..., 0] + p0[..., 1] * p1[..., 1]
    ry = p0[..., 0] * p1[..., 1] - p0[..., 1] * p1[..., 0]
    quotient = jnp.abs(ry) / rx
    length = positive_atan(quotient)
    dir_1d = rotate_90(dir_1)
    p1d = jnp.stack([jnp.sum(length_coeffs * dir_1d, -1), dir_1d[..., 1]], -1)
    rxd = p0[..., 0] * p1d[..., 0] + p0[..., 1] * p1d[..., 1]
    ryd = p0[..., 0] * p1d[..., 1] - p0[..., 1] * p1d[..., 0]
    qd = (ryd * rx - ry * rxd) / (rx * rx)
    qd = jnp.where(ry < 0.0, -qd, qd)
    length_d = qd / (quotient * quotient + 1.0)
    return cdf * length, cdf * length_d


def _edge_elevation(length_coeffs, elevations, rel_azimuth):
    """glsl:648-654."""
    direction = jnp.stack([jnp.cos(rel_azimuth), jnp.sin(rel_azimuth)], -1)
    point = jnp.stack([jnp.sum(length_coeffs * direction, -1),
                       direction[..., 1]], -1)
    point = normalize(point)
    return jnp.sum(point * elevations, axis=-1)


def prepare_projected_solid_angle_polygon_sampling_arvo(vertices,
                                                        vertex_count):
    """glsl:743-820. vertices: (MAXV, 3), clipped, first-vertex padded."""
    v = normalize(vertices)
    count = jnp.maximum(vertex_count, 3)
    lanes = jnp.arange(MAXV)
    active = lanes < count

    az = jnp.arctan2(v[:, 1], v[:, 0])
    az0 = az[0]
    az = jnp.where(az > az0 + M_PI, az - 2.0 * M_PI, az)
    az = jnp.where(az < az0 - M_PI, az + 2.0 * M_PI, az)

    next_v = jnp.roll(v, -1, axis=0)
    raw_cdf, raw_len, raw_elev = _prepare_edge(v, next_v)
    raw_inner = raw_cdf < 0.0

    # prev = cyclic shift by one (wrap lane 0 -> count-1), gather-free: a
    # dynamic-index gather under vmap serializes on TPU.
    lane0 = lanes == 0
    prev_cdf = jnp.where(lane0, pick_lane(raw_cdf, count - 1),
                         jnp.roll(raw_cdf, 1))
    prev_len = jnp.where(lane0[:, None], pick_lane(raw_len, count - 1),
                         jnp.roll(raw_len, 1, axis=0))
    prev_elev = jnp.where(lane0[:, None], pick_lane(raw_elev, count - 1),
                          jnp.roll(raw_elev, 1, axis=0))

    edge_cdf = jnp.where(raw_inner, prev_cdf, raw_cdf)
    edge_len = jnp.where(raw_inner[:, None], prev_len, raw_len)
    edge_elev = jnp.where(raw_inner[:, None], prev_elev, raw_elev)

    transition = active & (prev_cdf < 0.0) & (~raw_inner)
    has_transition = jnp.any(transition)
    first_trans = transition & (jnp.cumsum(transition) == 1)
    inner_cdf = jnp.where(
        has_transition,
        jnp.sum(jnp.where(first_trans, prev_cdf, 0.0)), 1.0)
    inner_len = jnp.where(
        has_transition,
        jnp.sum(jnp.where(first_trans[:, None], prev_len, 0.0), axis=0),
        jnp.zeros(2))
    inner_elev = jnp.where(
        has_transition,
        jnp.sum(jnp.where(first_trans[:, None], prev_elev, 0.0), axis=0),
        jnp.zeros(2))
    central = inner_cdf > 0.0

    # --- central case -------------------------------------------------------
    next_az = jnp.roll(az, -1, axis=0)
    central_psa = _edge_psa_in_sector(edge_cdf, edge_len,
                                      jnp.zeros(MAXV), next_az - az)
    central_psa = jnp.where(active, central_psa, 0.0)

    # --- decentral: sort by azimuth, walk sectors ---------------------------
    keys = jnp.where(active, az, jnp.inf)
    # Rank-based one-hot permutation (see ops/sampling.py): pure VPU
    # compare/select/reduce instead of argsort + serialized batched gathers.
    kj, kk = keys[:, None], keys[None, :]
    before = (kj < kk) | ((kj == kk) & (lanes[:, None] < lanes[None, :]))
    rank = jnp.sum(before, axis=0)
    perm = rank[None, :] == lanes[:, None]  # perm[j, k] <=> order[j] == k

    def permute(arr):
        mask = perm[..., None] if arr.ndim == 2 else perm
        return jnp.sum(jnp.where(mask, arr[None], jnp.zeros((), arr.dtype)),
                       axis=1)

    s_az = permute(az)
    s_cdf = permute(edge_cdf)
    s_len = permute(edge_len)
    s_elev = permute(edge_elev)

    in_cdf, in_len, in_elev = inner_cdf, inner_len, inner_elev
    in_az = s_az[0]
    out_cdf, out_len, out_elev, out_az = s_cdf[0], s_len[0], s_elev[0], s_az[0]
    si_cdf, si_len, si_elev, si_az = [], [], [], []
    so_cdf, so_len, so_elev, so_az = [], [], [], []
    for i in range(MAXV - 1):
        if i > 0:
            is_outer = s_cdf[i] >= 0.0
            in_cdf = jnp.where(is_outer, in_cdf, s_cdf[i])
            in_len = jnp.where(is_outer, in_len, s_len[i])
            in_elev = jnp.where(is_outer, in_elev, s_elev[i])
            in_az = jnp.where(is_outer, in_az, s_az[i])
            out_cdf = jnp.where(is_outer, s_cdf[i], out_cdf)
            out_len = jnp.where(is_outer, s_len[i], out_len)
            out_elev = jnp.where(is_outer, s_elev[i], out_elev)
            out_az = jnp.where(is_outer, s_az[i], out_az)
        si_cdf.append(in_cdf)
        si_len.append(in_len)
        si_elev.append(in_elev)
        si_az.append(in_az)
        so_cdf.append(out_cdf)
        so_len.append(out_len)
        so_elev.append(out_elev)
        so_az.append(out_az)
    pad = lambda lst: jnp.stack(lst + [lst[-1]], axis=0)
    si_cdf, si_len, si_elev, si_az = map(pad, (si_cdf, si_len, si_elev, si_az))
    so_cdf, so_len, so_elev, so_az = map(pad, (so_cdf, so_len, so_elev, so_az))

    sector_active = lanes < (count - 1)
    next_s_az = jnp.roll(s_az, -1, axis=0)
    dec_psa = _edge_psa_in_sector(so_cdf, so_len, s_az - so_az,
                                  next_s_az - so_az) \
        + _edge_psa_in_sector(si_cdf, si_len, s_az - si_az,
                              next_s_az - si_az)
    dec_psa = jnp.where(sector_active, dec_psa, 0.0)

    azimuths = jnp.where(central, az, s_az)
    e_cdf = jnp.where(central, edge_cdf, s_cdf)
    e_len = jnp.where(central, edge_len, s_len)
    e_elev = jnp.where(central, edge_elev, s_elev)
    sector_psa = jnp.where(central, central_psa, dec_psa)

    return ProjectedSolidAnglePolygonArvo(
        vertex_count=count,
        vertex_azimuths=azimuths,
        edge_cdf=e_cdf, edge_len=e_len, edge_elev=e_elev,
        inner_cdf=inner_cdf, inner_len=inner_len, inner_elev=inner_elev,
        inner_azimuth=s_az[0],
        sector_inner_cdf=si_cdf, sector_inner_len=si_len,
        sector_inner_elev=si_elev, sector_inner_azimuth=si_az,
        sector_outer_cdf=so_cdf, sector_outer_len=so_len,
        sector_outer_elev=so_elev, sector_outer_azimuth=so_az,
        sector_psa=sector_psa,
        projected_solid_angle=jnp.sum(sector_psa),
    )


def is_central_case_arvo(polygon: ProjectedSolidAnglePolygonArvo):
    return polygon.inner_cdf > 0.0


def _cubic_interpolation(sample_x, xs, ys):
    """Newton divided differences through 4 points (glsl:826-839)."""
    y01 = (ys[0] - ys[1]) / (xs[0] - xs[1])
    y12 = (ys[1] - ys[2]) / (xs[1] - xs[2])
    y23 = (ys[2] - ys[3]) / (xs[2] - xs[3])
    y012 = (y01 - y12) / (xs[0] - xs[2])
    y123 = (y12 - y23) / (xs[1] - xs[3])
    y0123 = (y012 - y123) / (xs[0] - xs[3])
    return (sample_x - xs[0]) * ((sample_x - xs[1]) * (
        (sample_x - xs[2]) * y0123 + y012) + y01) + ys[0]


def _select_sector(polygon, target, num_sectors):
    cum = jnp.cumsum(polygon.sector_psa)
    lanes = jnp.arange(MAXV)
    valid = lanes < num_sectors
    reached = (target < cum) & valid
    sel = jnp.where(jnp.any(reached), jnp.argmax(reached), num_sectors - 1)
    # pick_lane(cum, -1) == 0 for sel == 0, matching the reference's branch.
    remaining = target - pick_lane(cum, sel - 1)
    return sel, remaining


def sample_projected_solid_angle_polygon_arvo(
        polygon: ProjectedSolidAnglePolygonArvo, random_numbers,
        iteration_count: int = 3):
    """glsl:931-992."""
    target = random_numbers[0] * polygon.projected_solid_angle
    count = polygon.vertex_count
    central = is_central_case_arvo(polygon)

    # ---- central case ------------------------------------------------------
    sel_c, rem_c = _select_sector(polygon, target, count)
    out_cdf_c = pick_lane(polygon.edge_cdf, sel_c)
    out_len_c = pick_lane(polygon.edge_len, sel_c)
    out_elev_c = pick_lane(polygon.edge_elev, sel_c)
    out_az_c = pick_lane(polygon.vertex_azimuths, sel_c)
    next_idx = jnp.where(sel_c + 1 == count, 0, sel_c + 1)
    az1_c = pick_lane(polygon.vertex_azimuths, next_idx)
    az1_c = jnp.where(az1_c < out_az_c, az1_c + 2.0 * M_PI, az1_c)
    psa_c = pick_lane(polygon.sector_psa, sel_c)

    dir_central = _sample_sector(
        rem_c, random_numbers[1], None, None, None, None,
        out_cdf_c, out_len_c, out_elev_c, out_az_c,
        out_az_c, az1_c, iteration_count)

    # ---- decentral case ----------------------------------------------------
    sel_d, rem_d = _select_sector(polygon, target, count - 1)
    dir_decentral = _sample_sector(
        rem_d, random_numbers[1],
        pick_lane(polygon.sector_inner_cdf, sel_d),
        pick_lane(polygon.sector_inner_len, sel_d),
        pick_lane(polygon.sector_inner_elev, sel_d),
        pick_lane(polygon.sector_inner_azimuth, sel_d),
        pick_lane(polygon.sector_outer_cdf, sel_d),
        pick_lane(polygon.sector_outer_len, sel_d),
        pick_lane(polygon.sector_outer_elev, sel_d),
        pick_lane(polygon.sector_outer_azimuth, sel_d),
        pick_lane(polygon.vertex_azimuths, sel_d),
        pick_lane(polygon.vertex_azimuths, sel_d + 1),
        iteration_count)

    return jnp.where(central, dir_central, dir_decentral)


def _sample_sector(target, r1, in_cdf, in_len, in_elev, in_az,
                   out_cdf, out_len, out_elev, out_az,
                   azimuth_0, azimuth_1, iteration_count: int):
    """sample_sector_within_edge / between_edges (glsl:845-929).
    inner edge args may be None for the central case."""
    has_inner = in_cdf is not None
    azimuths = jnp.stack([
        azimuth_0,
        mix_fma(azimuth_0, azimuth_1, F32(1.0 / 3.0)),
        mix_fma(azimuth_0, azimuth_1, F32(2.0 / 3.0)),
        azimuth_1])
    psas = _edge_psa_in_sector(out_cdf, out_len,
                               azimuth_0 - out_az, azimuths - out_az)
    if has_inner:
        psas = psas + _edge_psa_in_sector(in_cdf, in_len,
                                          azimuth_0 - in_az,
                                          azimuths - in_az)
    sampled_az = _cubic_interpolation(target, psas, azimuths)
    for _ in range(iteration_count):
        out_psa, out_d = _edge_psa_and_derivative(
            out_cdf, out_len, azimuth_0 - out_az, sampled_az - out_az)
        if has_inner:
            in_psa, in_d = _edge_psa_and_derivative(
                in_cdf, in_len, azimuth_0 - in_az, sampled_az - in_az)
            error = in_psa + out_psa - target
            derivative = in_d + out_d
        else:
            error = out_psa - target
            derivative = out_d
        step = error / jnp.where(derivative != 0.0, derivative, 1.0)
        sampled_az = jnp.clip(sampled_az - step, azimuth_0, azimuth_1)

    cos_az = jnp.cos(sampled_az)
    sin_az = jnp.sin(sampled_az)
    out_z = _edge_elevation(out_len, out_elev, sampled_az - out_az)
    if has_inner:
        in_z = _edge_elevation(in_len, in_elev, sampled_az - in_az)
        z_sq = mix_fma(in_z * in_z, out_z * out_z, r1)
    else:
        z_sq = mix_fma(F32(1.0), out_z * out_z, r1)
    z = jnp.sqrt(jnp.maximum(z_sq, 0.0))
    r_xy = jnp.sqrt(jnp.maximum(-z * z + 1.0, 0.0))
    return jnp.stack([cos_az * r_xy, sin_az * r_xy, z])


def compute_projected_solid_angle_polygon_sampling_error_arvo(
        polygon: ProjectedSolidAnglePolygonArvo, random_numbers, sampled_dir):
    """glsl:998-1048: (backward error, scaled backward error)."""
    target = random_numbers[0] * polygon.projected_solid_angle
    sel, remaining = _select_sector(polygon, target,
                                    polygon.vertex_count - 1)
    azimuth_0 = pick_lane(polygon.vertex_azimuths, sel)
    sampled_az = jnp.arctan2(sampled_dir[1], sampled_dir[0])
    # Bring the sampled azimuth into the sector's wrapped frame.
    sampled_az = jnp.where(sampled_az < azimuth_0 - M_PI,
                           sampled_az + 2.0 * M_PI, sampled_az)
    sampled_az = jnp.where(sampled_az > azimuth_0 + M_PI,
                           sampled_az - 2.0 * M_PI, sampled_az)
    out_az = pick_lane(polygon.sector_outer_azimuth, sel)
    in_az = pick_lane(polygon.sector_inner_azimuth, sel)
    out_psa, _ = _edge_psa_and_derivative(
        pick_lane(polygon.sector_outer_cdf, sel),
        pick_lane(polygon.sector_outer_len, sel),
        azimuth_0 - out_az, sampled_az - out_az)
    in_psa, _ = _edge_psa_and_derivative(
        pick_lane(polygon.sector_inner_cdf, sel),
        pick_lane(polygon.sector_inner_len, sel),
        azimuth_0 - in_az, sampled_az - in_az)
    sampled_psa = out_psa + in_psa
    scaled = remaining - sampled_psa
    errors = jnp.stack([scaled / polygon.projected_solid_angle, scaled])
    return jnp.where(is_central_case_arvo(polygon), jnp.zeros(2), errors)
