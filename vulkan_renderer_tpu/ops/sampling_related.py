"""Related-work polygonal-light samplers needed by the paper's experiments.

TPU re-implementations of src/shaders/polygon_sampling_related_work.glsl:
- Turk uniform area sampling lives in render/shading.py (fan + density).
- Urena spherical-rectangle sampling (:97-192),
- Arvo spherical-triangle-fan solid angle sampling (:200-293),
- Hart et al. bilinear (:300-383) and biquadratic (:388-504) cosine warps
  in primary sample space (using the stable cubic solver, ops/cubic.py).

Arvo's projected solid angle sampling (:509-992) is implemented in
ops/sampling_arvo_psa.py.
All functions are unbatched + vmap-friendly, mirroring ops/sampling.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import MAX_POLYGON_VERTEX_COUNT as MAXV
from .cubic import solve_cubic
from .math_utils import (F32, M_PI, mix_fma, normalize, pick_lane,
                         positive_atan)
from .sampling import (SolidAnglePolygon, prepare_solid_angle_polygon_sampling,
                       sample_solid_angle_polygon)


# ===========================================================================
# Urena spherical rectangles
# ===========================================================================

class SolidAngleRectangleUrena(NamedTuple):
    o: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    z0: jnp.ndarray
    z0sq: jnp.ndarray
    x0: jnp.ndarray
    y0: jnp.ndarray
    y0sq: jnp.ndarray
    x1: jnp.ndarray
    y1: jnp.ndarray
    y1sq: jnp.ndarray
    b0: jnp.ndarray
    b1: jnp.ndarray
    b0sq: jnp.ndarray
    k: jnp.ndarray
    solid_angle: jnp.ndarray


def prepare_solid_angle_rectangle_sampling_urena(s, ex, ey, exl, eyl,
                                                 axis_x, axis_y, axis_z, o):
    """Urena et al. 2013 spherical-rectangle setup (glsl:121-165).
    axis_* are the orthonormal frame columns (axis_x ~ ex, axis_y ~ ey)."""
    d = s - o
    z0_raw = jnp.sum(d * axis_z)
    z = jnp.where(z0_raw > 0, -axis_z, axis_z)
    z0 = -jnp.abs(z0_raw)
    x0 = jnp.sum(d * axis_x)
    y0 = jnp.sum(d * axis_y)
    x1 = x0 + exl
    y1 = y0 + eyl

    v00 = jnp.stack([x0, y0, z0])
    v01 = jnp.stack([x0, y1, z0])
    v10 = jnp.stack([x1, y0, z0])
    v11 = jnp.stack([x1, y1, z0])
    n0 = normalize(jnp.cross(v00, v10))
    n1 = normalize(jnp.cross(v10, v11))
    n2 = normalize(jnp.cross(v11, v01))
    n3 = normalize(jnp.cross(v01, v00))
    g0 = jnp.arccos(jnp.clip(-jnp.sum(n0 * n1), -1.0, 1.0))
    g1 = jnp.arccos(jnp.clip(-jnp.sum(n1 * n2), -1.0, 1.0))
    g2 = jnp.arccos(jnp.clip(-jnp.sum(n2 * n3), -1.0, 1.0))
    g3 = jnp.arccos(jnp.clip(-jnp.sum(n3 * n0), -1.0, 1.0))
    b0 = n0[2]
    b1 = n2[2]
    k = 2.0 * M_PI - g2 - g3
    return SolidAngleRectangleUrena(
        o=o, x=axis_x, y=axis_y, z=z, z0=z0, z0sq=z0 * z0,
        x0=x0, y0=y0, y0sq=y0 * y0, x1=x1, y1=y1, y1sq=y1 * y1,
        b0=b0, b1=b1, b0sq=b0 * b0, k=k, solid_angle=g0 + g1 - k)


def sample_solid_angle_rectangle_urena(squad: SolidAngleRectangleUrena,
                                       random_numbers):
    """Area-preserving rectangle parametrization (glsl:172-192)."""
    u, v = random_numbers[0], random_numbers[1]
    au = u * squad.solid_angle + squad.k
    fu = (jnp.cos(au) * squad.b0 - squad.b1) / jnp.sin(au)
    cu = 1.0 / jnp.sqrt(fu * fu + squad.b0sq)
    cu = jnp.where(fu > 0.0, cu, -cu)
    cu = jnp.clip(cu, -1.0, 1.0)
    xu = -(cu * squad.z0) / jnp.sqrt(jnp.maximum(1.0 - cu * cu, 1e-20))
    xu = jnp.clip(xu, squad.x0, squad.x1)
    d = jnp.sqrt(xu * xu + squad.z0sq)
    h0 = squad.y0 / jnp.sqrt(d * d + squad.y0sq)
    h1 = squad.y1 / jnp.sqrt(d * d + squad.y1sq)
    hv = h0 + v * (h1 - h0)
    mhv2_1 = -hv * hv + 1.0
    yv = jnp.where(mhv2_1 >= 0.0,
                   (hv * d) / jnp.sqrt(jnp.maximum(mhv2_1, 1e-20)), squad.y1)
    return normalize(xu * squad.x + yv * squad.y + squad.z0 * squad.z)


# ===========================================================================
# Arvo spherical triangle fans (solid angle)
# ===========================================================================

class SolidAnglePolygonArvo(NamedTuple):
    vertex_count: jnp.ndarray
    vertex_dirs: jnp.ndarray        # (MAXV, 3)
    fan_solid_angles: jnp.ndarray   # (MAXV-2,)
    opposite_dirs: jnp.ndarray      # (MAXV-2, 2) cos/sin of edge angle
    solid_angle: jnp.ndarray


def prepare_solid_angle_polygon_sampling_arvo(vertices, vertex_count,
                                              shading_position):
    """Arvo 1995 stratified spherical-triangle setup (glsl:219-257)."""
    dirs = normalize(vertices - shading_position[None, :])
    tri = jnp.arange(MAXV - 2)
    v0 = dirs[0]
    v1 = dirs[tri + 1]
    v2 = dirs[tri + 2]
    edge_n0 = normalize(jnp.cross(v1 - v0[None], jnp.broadcast_to(v0, v1.shape)))
    edge_n1 = normalize(jnp.cross(v2 - v1, v1))
    cos_op = -jnp.sum(edge_n0 * edge_n1, axis=-1)
    sin_op = jnp.sqrt(jnp.maximum(0.0, -cos_op * cos_op + 1.0))
    opposite = jnp.stack([cos_op, sin_op], axis=-1)

    dot_0_1 = jnp.sum(v0[None] * v1, axis=-1)
    dot_0_2 = jnp.sum(v0[None] * v2, axis=-1)
    dot_1_2 = jnp.sum(v1 * v2, axis=-1)
    simplex = jnp.sum(v0[None] * jnp.cross(v1, v2), axis=-1)
    tangent = jnp.abs(simplex) / (1.0 + dot_0_1 + dot_0_2 + dot_1_2)
    tri_sa = 2.0 * positive_atan(tangent)
    tri_active = tri + 2 < jnp.maximum(vertex_count, 3)
    tri_sa = jnp.where(tri_active, tri_sa, 0.0)
    fan = jnp.cumsum(tri_sa)
    return SolidAnglePolygonArvo(vertex_count, dirs, fan, opposite, fan[-1])


def sample_solid_angle_polygon_arvo(polygon: SolidAnglePolygonArvo,
                                    random_numbers):
    """Arvo 1995 sampling (glsl:262-293)."""
    target = polygon.solid_angle * random_numbers[0]
    tri = jnp.arange(MAXV - 2)
    valid = tri + 2 < jnp.maximum(polygon.vertex_count, 3)
    reached = (polygon.fan_solid_angles >= target) & valid
    last_valid = jnp.maximum(polygon.vertex_count - 3, 0)
    sel = jnp.where(jnp.any(reached), jnp.argmax(reached), last_valid)
    prev_fan = pick_lane(polygon.fan_solid_angles, sel - 1)  # 0 when sel == 0
    sub_sa = target - prev_fan
    opposite = pick_lane(polygon.opposite_dirs, sel)
    tv0 = pick_lane(polygon.vertex_dirs, sel + 1)
    tv1 = polygon.vertex_dirs[0]
    tv2 = pick_lane(polygon.vertex_dirs, sel + 2)

    ssa_cos = jnp.cos(sub_sa)
    ssa_sin = jnp.sin(sub_sa)
    p = ssa_sin * opposite[0] - ssa_cos * opposite[1]
    q = ssa_sin * opposite[1] + ssa_cos * opposite[0]
    u = q - opposite[0]
    v = p + opposite[1] * jnp.sum(tv0 * tv1)
    s = ((v * q - u * p) * opposite[0] - v) / ((v * p + u * q) * opposite[1])
    edge_tan_20 = normalize(tv2 - jnp.sum(tv0 * tv2) * tv0)
    vertex_2 = s * tv0 + jnp.sqrt(jnp.clip(-s * s + 1.0, 0.0, 1.0)) * edge_tan_20
    z = 1.0 - random_numbers[1] * (1.0 - jnp.sum(vertex_2 * tv1))
    edge_tan_21 = normalize(vertex_2 - jnp.sum(tv1 * vertex_2) * tv1)
    return z * tv1 + jnp.sqrt(jnp.clip(-z * z + 1.0, 0.0, 1.0)) * edge_tan_21


# ===========================================================================
# Hart et al. cosine warps in primary sample space
# ===========================================================================

class BilinearCosineWarpHart(NamedTuple):
    polygon: SolidAnglePolygon
    density_0: jnp.ndarray
    density_1: jnp.ndarray  # (2,)


def _last_vertex_z(dirs, vertex_count):
    """z of the last active vertex (glsl register-spill workaround loop)."""
    idx = jnp.clip(vertex_count - 1, 2, MAXV - 1)
    return pick_lane(dirs[:, 2], idx)


def prepare_bilinear_cosine_warp_polygon_sampling_hart(vertices, vertex_count,
                                                       biased: bool = False):
    """Bilinear cosine approximation warp setup (glsl:316-344)."""
    polygon = prepare_solid_angle_polygon_sampling(
        vertices, vertex_count, jnp.zeros(3), biased)
    density_0 = jnp.maximum(0.0, polygon.vertex_dirs[0, 2])
    d1_0 = jnp.maximum(0.0, polygon.vertex_dirs[1, 2])
    d1_1 = jnp.maximum(0.0, _last_vertex_z(polygon.vertex_dirs, vertex_count))
    density_1 = jnp.stack([d1_0, d1_1])
    density_sum = 2.0 * density_0 + density_1[0] + density_1[1]
    normalization = 4.0 / (polygon.solid_angle * density_sum)
    inv_sa = 1.0 / polygon.solid_angle
    degenerate = density_sum <= 0.0
    density_0 = jnp.where(degenerate, inv_sa, density_0 * normalization)
    density_1 = jnp.where(degenerate, inv_sa, density_1 * normalization)
    return BilinearCosineWarpHart(polygon, density_0, density_1)


def linear_warp(random_number, density_0, density_1):
    """Muller's-method linear warp (glsl:350-364)."""
    lerped_sq = mix_fma(density_0 * density_0, density_1 * density_1,
                        random_number)
    divisor = density_0 + jnp.sqrt(jnp.maximum(lerped_sq, 0.0))
    return random_number * (density_0 + density_1) \
        / jnp.where(divisor != 0.0, divisor, 1.0)


def sample_bilinear_cosine_warp_polygon_hart(polygon: BilinearCosineWarpHart,
                                             random_numbers):
    """Returns (direction, density) (glsl:375-383)."""
    r1 = linear_warp(random_numbers[1], 2.0 * polygon.density_0,
                     polygon.density_1[0] + polygon.density_1[1])
    density_0 = mix_fma(polygon.density_0, polygon.density_1[0], r1)
    density_1 = mix_fma(polygon.density_0, polygon.density_1[1], r1)
    r0 = linear_warp(random_numbers[0], density_0, density_1)
    density = mix_fma(density_0, density_1, r0)
    direction = sample_solid_angle_polygon(polygon.polygon, jnp.stack([r0, r1]))
    return direction, density


class BiquadraticCosineWarpHart(NamedTuple):
    polygon: SolidAnglePolygon
    density_0: jnp.ndarray
    density_1: jnp.ndarray  # (3,)
    density_2: jnp.ndarray  # (3,)


def prepare_biquadratic_cosine_warp_polygon_sampling_hart(vertices,
                                                          vertex_count,
                                                          biased: bool = False):
    """Biquadratic cosine approximation warp setup (glsl:405-455)."""
    polygon = prepare_solid_angle_polygon_sampling(
        vertices, vertex_count, jnp.zeros(3), biased)
    last_idx = jnp.clip(vertex_count - 1, 2, MAXV - 1)
    last_vertex = polygon.vertex_dirs[last_idx]
    vertex_0 = polygon.vertex_dirs[0]
    density_0 = jnp.maximum(0.0, vertex_0[2])
    d2_0 = jnp.maximum(0.0, polygon.vertex_dirs[1, 2])
    d2_2 = jnp.maximum(0.0, last_vertex[2])
    sample_2_1 = sample_solid_angle_polygon(polygon,
                                            jnp.asarray([0.5, 1.0], F32))
    d2_1 = jnp.maximum(0.0, sample_2_1[2])
    density_2 = jnp.stack([d2_0, d2_1, d2_2])

    # Middle row: re-run the tail of solid angle sampling with r1 = 0.5.
    far = jnp.stack([vertex_0, sample_2_1, last_vertex])
    s2 = jnp.sum(vertex_0[None] * far, axis=-1)
    s = 0.5 * s2 + 0.5
    t = jnp.sqrt(jnp.maximum(0.0, -s * s + 1.0))
    t_axis_z = -s2 * vertex_0[2] + far[:, 2]
    norm_t_axis = 1.0 / jnp.sqrt(jnp.maximum(2.0 * (-s2 * s2 + 1.0), 1e-20))
    density_1 = jnp.maximum(0.0, s * vertex_0[2] + t * norm_t_axis * t_axis_z)

    density_sum = 3.0 * density_0 + jnp.sum(density_1) + jnp.sum(density_2)
    normalization = 9.0 / (polygon.solid_angle * density_sum)
    inv_sa = 1.0 / polygon.solid_angle
    degenerate = density_sum <= 0.0
    density_0 = jnp.where(degenerate, inv_sa, density_0 * normalization)
    density_1 = jnp.where(degenerate, inv_sa, density_1 * normalization)
    density_2 = jnp.where(degenerate, inv_sa, density_2 * normalization)
    return BiquadraticCosineWarpHart(polygon, density_0, density_1, density_2)


def quadratic_warp(random_number, density_0, density_1, density_2):
    """Invert the integral of a quadratic Bezier density (glsl:462-485)."""
    q0 = density_0
    q1 = 2.0 * (density_1 - density_0)
    q2 = density_0 - 2.0 * density_1 + density_2
    c1 = q0
    c2 = 0.5 * q1
    c3 = (1.0 / 3.0) * q2
    scaled = random_number * (c1 + c2 + c3)
    coeffs = jnp.stack([-scaled, c1, c2, c3], axis=-1)
    roots, three_real = solve_cubic(coeffs)
    result = roots[..., 0]
    in_unit_1 = (roots[..., 1] >= 0.0) & (roots[..., 1] <= 1.0)
    in_unit_2 = (roots[..., 2] >= 0.0) & (roots[..., 2] <= 1.0)
    result = jnp.where(three_real & in_unit_1, roots[..., 1], result)
    result = jnp.where(three_real & in_unit_2, roots[..., 2], result)
    return result


def quadratic_bezier(b0, b1, b2, location):
    b_1_0 = mix_fma(b0, b1, location)
    b_1_1 = mix_fma(b1, b2, location)
    return mix_fma(b_1_0, b_1_1, location)


def sample_biquadratic_cosine_warp_polygon_hart(
        polygon: BiquadraticCosineWarpHart, random_numbers):
    """Returns (direction, density) (glsl:496-504)."""
    r1 = quadratic_warp(random_numbers[1], 3.0 * polygon.density_0,
                        jnp.sum(polygon.density_1), jnp.sum(polygon.density_2))
    d0 = quadratic_bezier(polygon.density_0, polygon.density_1[0],
                          polygon.density_2[0], r1)
    d1 = quadratic_bezier(polygon.density_0, polygon.density_1[1],
                          polygon.density_2[1], r1)
    d2 = quadratic_bezier(polygon.density_0, polygon.density_1[2],
                          polygon.density_2[2], r1)
    r0 = quadratic_warp(random_numbers[0], d0, d1, d2)
    density = quadratic_bezier(d0, d1, d2, r0)
    direction = sample_solid_angle_polygon(polygon.polygon, jnp.stack([r0, r1]))
    return direction, density
