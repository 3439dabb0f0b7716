"""Polygonal-light sampling: solid angle (our method) and projected solid
angle (the SIGGRAPH 2021 paper's method).

TPU-native re-implementation of src/shaders/polygon_sampling.glsl. The GLSL
version is built around early-exit loops, a branchy jump-table polygon
representation and per-thread scalar state; here everything is masked,
fixed-shape and vmap-friendly:

- Polygons are (MAX_VERTS, ...) lanes + a scalar count, with the first
  vertex repeated in unused lanes (same convention as the reference).
- The fan/sector *selection loops* become vectorized first-true searches.
- The sequential inner/outer ellipse state walk of the decentral case is an
  unrolled static scan of MAX_VERTS steps; per-sector inner/outer ellipses
  are cached in the prepared structure so sampling needs no re-walk.
- The counterclockwise sorting networks (polygon_sampling.glsl:440-505) are
  kept as static compare-and-swap sequences selected by lax.switch.
- Kahan/fma stability tricks are preserved through error-free two_product
  transforms (see ops.math_utils.kahan).

References into the GLSL are given per function for parity checking.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import MAX_POLYGON_VERTEX_COUNT
from .math_utils import (F32, M_HALF_PI, M_PI, cross_stable, cumsum_lanes,
                         fast_positive_atan, first_true_lane, kahan, mix_fma,
                         normalize, pick_lane, positive_atan)

MAXV = MAX_POLYGON_VERTEX_COUNT
_INF = jnp.float32(jnp.inf)


def _pos_atan(tangent, biased: bool):
    return fast_positive_atan(tangent) if biased else positive_atan(tangent)


# ===========================================================================
# Solid angle sampling (our variant of Arvo's method)
# polygon_sampling.glsl:61-224
# ===========================================================================

class SolidAnglePolygon(NamedTuple):
    vertex_count: jnp.ndarray         # () int32
    vertex_dirs: jnp.ndarray          # (MAXV, 3)
    triangle_parameters: jnp.ndarray  # (MAXV-2, 3)
    fan_solid_angles: jnp.ndarray     # (MAXV-2,)
    solid_angle: jnp.ndarray          # ()


def prepare_solid_angle_polygon_sampling(vertices, vertex_count,
                                         shading_position,
                                         biased: bool = False):
    """Triangle-fan solid angles via Householder-stabilized Oosterom-Strackee
    (polygon_sampling.glsl:120-175).

    vertices: (MAXV, 3) with first-vertex padding; shading_position: (3,).
    """
    dirs = normalize(vertices - shading_position[None, :])

    d0 = dirs[0]
    householder_sign = jnp.where(d0[0] > 0.0, F32(-1.0), F32(1.0))
    householder_yz = d0[1:] * (1.0 / (jnp.abs(d0[0]) + 1.0))

    # Fan triangle i uses vertices (i+1, 0, i+2).
    tri = np.arange(MAXV - 2)
    v0 = dirs[tri + 1]            # (T, 3)
    v1 = d0[None, :]
    v2 = dirs[tri + 2]
    dot_0_1 = jnp.sum(v0 * v1, axis=-1)
    dot_0_2 = jnp.sum(v0 * v2, axis=-1)
    dot_1_2 = jnp.sum(v1 * v2, axis=-1)

    dot_householder_0 = -householder_sign * v0[:, 0] + dot_0_1
    dot_householder_2 = -householder_sign * v2[:, 0] + dot_1_2
    # Bottom-right 2x2 minor after the Householder transform.
    col0 = -dot_householder_0[:, None] * householder_yz[None, :] + v0[:, 1:]
    col1 = -dot_householder_2[:, None] * householder_yz[None, :] + v2[:, 1:]
    simplex_volume = jnp.abs(col0[:, 0] * col1[:, 1] - col0[:, 1] * col1[:, 0])

    dot_0_2_plus_1_2 = dot_0_2 + dot_1_2
    one_plus_dot_0_1 = 1.0 + dot_0_1
    tangent = simplex_volume / (one_plus_dot_0_1 + dot_0_2_plus_1_2)
    tri_solid_angle = 2.0 * _pos_atan(tangent, biased)
    tri_active = tri + 2 < jnp.maximum(vertex_count, 3)
    tri_solid_angle = jnp.where(tri_active, tri_solid_angle, 0.0)

    fan = cumsum_lanes(tri_solid_angle)
    params = jnp.stack([simplex_volume, dot_0_2_plus_1_2, one_plus_dot_0_1],
                       axis=-1)
    return SolidAnglePolygon(vertex_count, dirs, params, fan, fan[-1])


def sample_solid_angle_polygon(polygon: SolidAnglePolygon, random_numbers):
    """Map [0,1]^2 to a solid-angle-uniform direction
    (polygon_sampling.glsl:194-224)."""
    target = polygon.solid_angle * random_numbers[0]
    tri = np.arange(MAXV - 2)
    # First fan triangle whose cumulative solid angle reaches the target.
    valid = tri + 2 < jnp.maximum(polygon.vertex_count, 3)
    reached = (polygon.fan_solid_angles >= target) & valid
    last_valid = jnp.maximum(polygon.vertex_count - 3, 0)
    sel = first_true_lane(reached, last_valid)

    prev_fan = pick_lane(polygon.fan_solid_angles, sel - 1)  # 0 when sel == 0
    sub_solid_angle = target - prev_fan
    params = pick_lane(polygon.triangle_parameters, sel)
    v0 = pick_lane(polygon.vertex_dirs, sel + 1)
    v1 = polygon.vertex_dirs[0]
    v2 = pick_lane(polygon.vertex_dirs, sel + 2)

    cos_h = jnp.cos(0.5 * sub_solid_angle)
    sin_h = jnp.sin(0.5 * sub_solid_angle)
    offset = v0 * (params[0] * cos_h - params[1] * sin_h) + v2 * (params[2] * sin_h)
    new_v2 = (2.0 * jnp.sum(v0 * offset) / jnp.sum(offset * offset)) * offset - v0

    s2 = jnp.sum(v1 * new_v2)
    s = mix_fma(F32(1.0), s2, random_numbers[1])
    denominator = -s2 * s2 + 1.0
    t_normed = jnp.sqrt(jnp.maximum(0.0, (-s * s + 1.0)) /
                        jnp.where(denominator > 0.0, denominator, 1.0))
    t_normed = jnp.where(denominator > 0.0, t_normed, random_numbers[1])
    return (-t_normed * s2 + s) * v1 + t_normed * new_v2


# ===========================================================================
# Projected solid angle sampling (the paper's method)
# polygon_sampling.glsl:230-883
# ===========================================================================

class ProjectedSolidAnglePolygon(NamedTuple):
    vertex_count: jnp.ndarray   # () int32
    vertices: jnp.ndarray       # (MAXV, 2) xy, ccw-sorted in decentral case
    ellipses: jnp.ndarray       # (MAXV, 2)
    inner_ellipse_0: jnp.ndarray  # (2,)
    # Running inner/outer ellipse per decentral sector (cached so sampling
    # does not re-walk the sequential state machine of the GLSL loops).
    sector_inner: jnp.ndarray   # (MAXV, 2)
    sector_outer: jnp.ndarray   # (MAXV, 2)
    sector_psa: jnp.ndarray     # (MAXV,) projected solid angle per sector
    projected_solid_angle: jnp.ndarray  # ()


def rotate_90(v):
    return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


def is_inner_ellipse(ellipse_x):
    """Sign *bit* of ellipse.x distinguishes inner from outer edges,
    including -0.0 (polygon_sampling.glsl:292-299). Implemented as a
    bitcast + integer compare: jnp.signbit lowers through an i32->bool
    convert that Mosaic cannot compile."""
    bits = jax.lax.bitcast_convert_type(jnp.asarray(ellipse_x, F32),
                                        jnp.int32)
    return bits < 0


def ellipse_from_edge(vertex_0, vertex_1):
    """Great-circle normal in half-vector space (polygon_sampling.glsl:317-326)."""
    normal = cross_stable(vertex_0, vertex_1)
    scaling = 1.0 / jnp.where(normal[..., 2] != 0.0, normal[..., 2], 1.0)
    scaling = jnp.where(is_inner_ellipse(normal[..., 0]), -scaling, scaling)
    ellipse = normal[..., :2] * scaling[..., None]
    ex = jnp.where(normal[..., 2] != 0.0, ellipse[..., 0], _INF)
    return jnp.stack([ex, ellipse[..., 1]], axis=-1)


def ellipse_transform(ellipse, point):
    return jnp.sum(ellipse * point, axis=-1, keepdims=True) * ellipse + point


def get_ellipse_det(ellipse):
    return ellipse[..., 0] * ellipse[..., 0] + ellipse[..., 1] * ellipse[..., 1] + 1.0


def get_ellipse_rsqrt_det(ellipse):
    return 1.0 / jnp.sqrt(get_ellipse_det(ellipse))


def get_ellipse_direction_factor_rsq(ellipse, direction):
    e_dot_d = jnp.sum(ellipse * direction, axis=-1)
    return e_dot_d * e_dot_d + jnp.sum(direction * direction, axis=-1)


def get_ellipse_direction_factor(ellipse, direction):
    return 1.0 / jnp.sqrt(get_ellipse_direction_factor_rsq(ellipse, direction))


def get_ellipse_normalized_direction_factor(ellipse, normalized_dir):
    e_dot_d = jnp.sum(ellipse * normalized_dir, axis=-1)
    return 1.0 / jnp.sqrt(e_dot_d * e_dot_d + 1.0)


def _area_between_from_tangents(inner_rsqrt_det, inner_tangent,
                                outer_rsqrt_det, outer_tangent, biased):
    inner_area = inner_rsqrt_det * _pos_atan(inner_tangent, biased)
    result = outer_rsqrt_det * _pos_atan(outer_tangent, biased) - inner_area
    # NaNs and negatives collapse to zero (glsl:377-382).
    return jnp.where(result > 0.0, 0.5 * result, 0.0)


def get_area_between_ellipses_in_sector(inner_ellipse, inner_rsqrt_det,
                                        outer_ellipse, outer_rsqrt_det,
                                        dir_0, dir_1, biased=False):
    det_dirs = jnp.maximum(0.0, jnp.sum(dir_1 * rotate_90(dir_0), axis=-1))
    inner_dot = inner_rsqrt_det * jnp.sum(dir_0 * ellipse_transform(inner_ellipse, dir_1), axis=-1)
    outer_dot = outer_rsqrt_det * jnp.sum(dir_0 * ellipse_transform(outer_ellipse, dir_1), axis=-1)
    return _area_between_from_tangents(inner_rsqrt_det, det_dirs / inner_dot,
                                       outer_rsqrt_det, det_dirs / outer_dot,
                                       biased)


def get_ellipse_area_in_sector(ellipse, dir_0, dir_1, biased=False):
    rsqrt_det = get_ellipse_rsqrt_det(ellipse)
    det_dirs = jnp.maximum(0.0, jnp.sum(dir_1 * rotate_90(dir_0), axis=-1))
    ellipse_dot = rsqrt_det * jnp.sum(dir_0 * ellipse_transform(ellipse, dir_1), axis=-1)
    area = 0.5 * rsqrt_det * _pos_atan(det_dirs / ellipse_dot, biased)
    return jnp.where(rsqrt_det > 0.0, area, 0.0)


# --- counterclockwise sorting networks (polygon_sampling.glsl:421-505) -----

_NETWORKS = {
    3: [(1, 2), (0, 2), (0, 1)],
    4: [(1, 3), (0, 2), (2, 3), (0, 1)],
    5: [(2, 4), (1, 3), (1, 2), (0, 3), (3, 4), (0, 2), (2, 3), (0, 1)],
    6: [(3, 5), (2, 4), (1, 5), (0, 4), (4, 5), (1, 3), (0, 2), (2, 3), (0, 1)],
    7: [(2, 5), (1, 6), (5, 6), (3, 4), (0, 4), (4, 6), (1, 3), (3, 5),
        (4, 5), (0, 2), (2, 3), (0, 1)],
    8: [(2, 6), (3, 7), (1, 5), (0, 4), (4, 6), (5, 7), (6, 7), (4, 5),
        (1, 3), (0, 2), (2, 3), (0, 1)],
}


def _compare_and_swap(vertices, ellipses, lhs: int, rhs: int):
    """Swap lanes lhs/rhs if the short path lhs->rhs is clockwise
    (polygon_sampling.glsl:421-435)."""
    vl, vr = vertices[lhs], vertices[rhs]
    normal_z = kahan(vl[0], -vr[1], vl[1], -vr[0])
    swap = jnp.where(normal_z == 0.0,
                     jnp.isinf(ellipses[rhs][0]),
                     normal_z > 0.0)
    new_vl = jnp.where(swap, vr, vl)
    new_vr = jnp.where(swap, vl, vr)
    vertices = vertices.at[lhs].set(new_vl).at[rhs].set(new_vr)
    el, er = ellipses[lhs], ellipses[rhs]
    ellipses = ellipses.at[lhs].set(jnp.where(swap, er, el))
    ellipses = ellipses.at[rhs].set(jnp.where(swap, el, er))
    return vertices, ellipses


def _sort_convex_polygon_vertices_network(vertices, ellipses, vertex_count):
    """Counterclockwise sort via the reference's per-count sorting networks
    (kept for cross-validation; the rotation-based sort below is ~10x
    cheaper on TPU because a vmapped lax.switch executes every network)."""
    def make_branch(n):
        def branch(args):
            v, e = args
            for lhs, rhs in _NETWORKS[n]:
                v, e = _compare_and_swap(v, e, lhs, rhs)
            return v, e
        return branch

    branches = [make_branch(n) for n in range(3, MAXV + 1)]
    idx = jnp.clip(vertex_count - 3, 0, MAXV - 3)
    return jax.lax.switch(idx, branches, (vertices, ellipses))


def _sort_convex_polygon_vertices(vertices, ellipses, vertex_count):
    """Counterclockwise sort by relative angle (single argsort).

    The decentral case guarantees all vertex directions lie within one
    half-plane (origin outside the projected polygon), so signed angles
    relative to any vertex direction stay inside (-pi, pi) — no wraparound
    — and one argsort reproduces the reference's network order at ~10x
    less TPU cost than the vmapped lax.switch over six networks.
    """
    lanes = np.arange(MAXV)
    count = jnp.maximum(vertex_count, 3)
    active = lanes < count
    ref = vertices[0]
    cross = kahan(ref[0], vertices[:, 1], ref[1], vertices[:, 0])
    dot = ref[0] * vertices[:, 0] + ref[1] * vertices[:, 1]
    # Pseudo-angle: strictly monotonic in atan2(cross, dot) over (-pi, pi]
    # and exactly tie-preserving, but branchless VPU arithmetic (atan2 has
    # no Mosaic lowering, and only the ORDER of the keys matters here).
    p = dot / (jnp.abs(dot) + jnp.abs(cross) + F32(1e-37))
    # Branch on the SIGN BIT (not cross >= 0) so cross == -0.0 keys as
    # atan2(-0.0, dot<0) = -pi (sorts first), matching the reference
    # network order on the xy-antipodal measure-zero case.
    keys = jnp.where(jnp.signbit(cross), p - 1.0, 1.0 - p)
    keys = jnp.where(active, keys, F32(4.0))
    # Rank-based permutation instead of argsort + gather: both the sort and
    # the permutation apply become 8x8 VPU compare/select/reduce ops (a
    # batched gather under vmap serializes on TPU). rank[k] = stable-sort
    # position of k; the one-hot (rank[k] == j) IS the permutation matrix,
    # and each masked sum has exactly one nonzero term (bit-exact).
    kj, kk = keys[:, None], keys[None, :]
    before = (kj < kk) | ((kj == kk) & (lanes[:, None] < lanes[None, :]))
    rank = jnp.sum(before, axis=0)  # (MAXV,) position of lane k
    perm = rank[None, :] == lanes[:, None]  # perm[j, k] <=> order[j] == k
    zero_v = jnp.zeros((), vertices.dtype)
    sorted_v = jnp.sum(jnp.where(perm[..., None], vertices[None], zero_v),
                       axis=1)
    sorted_e = jnp.sum(jnp.where(perm[..., None], ellipses[None], zero_v),
                       axis=1)
    return sorted_v, sorted_e


def prepare_projected_solid_angle_polygon_sampling(vertices, vertex_count,
                                                   biased: bool = False):
    """Prepare PSA sampling (polygon_sampling.glsl:521-589).

    vertices: (MAXV, 3) in a frame where the normal is +z, already clipped to
    z >= 0, first vertex repeated in unused lanes, clockwise winding as seen
    from the origin.
    """
    count = jnp.maximum(vertex_count, 3)
    lanes = np.arange(MAXV)
    active = lanes < count

    # Raw ellipses for edge i -> i+1. Padding repeats vertex 0 at lane
    # `count`, so the wrap-around edge is formed correctly for any count.
    next_v = jnp.roll(vertices, -1, axis=0)
    raw = ellipse_from_edge(vertices, next_v)
    # For count < MAXV the closing edge is (count-1) -> count where
    # v[count] == v[0]; roll gives (count-1) -> count which is correct
    # because of the padding. Lanes >= count are inactive.

    raw_inner = is_inner_ellipse(raw[:, 0])
    # prev = cyclic shift by one (wrap at lane 0 -> count-1), gather-free.
    last_raw = pick_lane(raw, count - 1)
    last_inner = pick_lane(raw_inner, count - 1)
    lane0 = lanes == 0
    prev_raw = jnp.where(lane0[:, None], last_raw, jnp.roll(raw, 1, axis=0))
    # Logical blend, not jnp.where: select on BOOL payloads lowers through
    # an i8 truncation Mosaic rejects.
    prev_inner = (lane0 & last_inner) | (~lane0 & jnp.roll(raw_inner, 1))

    # If edge i is inner, vertex i keeps the previous (outer) ellipse.
    ellipses = jnp.where(raw_inner[:, None], prev_raw, raw)
    # The dropped inner ellipse at the inner->outer transition is recorded
    # (first transition lane, selected one-hot instead of argmax + gather).
    transition = active & prev_inner & (~raw_inner)
    has_transition = jnp.any(transition)
    first_trans = transition & (cumsum_lanes(transition.astype(jnp.int32))
                                == 1)
    picked = jnp.sum(jnp.where(first_trans[:, None], prev_raw, 0.0), axis=0)
    inner_ellipse_0 = jnp.where(has_transition, picked,
                                jnp.array([1.0, 0.0], F32))

    central = inner_ellipse_0[0] > 0.0

    # --- central case: one ellipse per sector --------------------------------
    v_xy = vertices[:, :2]
    next_xy = next_v[:, :2]
    central_psa = get_ellipse_area_in_sector(ellipses, v_xy, next_xy, biased)
    central_psa = jnp.where(active, central_psa, 0.0)

    # --- decentral case: sort ccw, then walk sectors -------------------------
    sorted_v, sorted_e = _sort_convex_polygon_vertices(v_xy, ellipses, count)

    # Unrolled walk over sectors i = 0 .. count-2 maintaining the running
    # inner/outer ellipse state (glsl:563-586).
    inner_e = inner_ellipse_0
    outer_e = sorted_e[0]
    sector_inner = []
    sector_outer = []
    for i in range(MAXV - 1):
        if i > 0:
            vertex_e = sorted_e[i]
            vertex_is_inner = is_inner_ellipse(vertex_e[0])
            inner_e = jnp.where(vertex_is_inner, vertex_e, inner_e)
            outer_e = jnp.where(vertex_is_inner, outer_e, vertex_e)
        sector_inner.append(inner_e)
        sector_outer.append(outer_e)
    sector_inner = jnp.stack(sector_inner + [sector_inner[-1]], axis=0)
    sector_outer = jnp.stack(sector_outer + [sector_outer[-1]], axis=0)

    sector_active = lanes < (count - 1)
    decentral_psa = get_area_between_ellipses_in_sector(
        sector_inner, get_ellipse_rsqrt_det(sector_inner),
        sector_outer, get_ellipse_rsqrt_det(sector_outer),
        sorted_v, jnp.roll(sorted_v, -1, axis=0), biased)
    decentral_psa = jnp.where(sector_active, decentral_psa, 0.0)

    out_vertices = jnp.where(central, v_xy, sorted_v)
    out_ellipses = jnp.where(central, ellipses, sorted_e)
    sector_psa = jnp.where(central, central_psa, decentral_psa)
    total = jnp.sum(sector_psa)

    return ProjectedSolidAnglePolygon(
        vertex_count=count,
        vertices=out_vertices,
        ellipses=out_ellipses,
        inner_ellipse_0=inner_ellipse_0,
        sector_inner=sector_inner,
        sector_outer=sector_outer,
        sector_psa=sector_psa,
        projected_solid_angle=total,
    )


def is_central_case(polygon: ProjectedSolidAnglePolygon):
    return polygon.inner_ellipse_0[0] > 0.0


def _normalize_approx_and_flip(rhs, semi_circle):
    """Cheap magnitude normalization with sign flip
    (polygon_sampling.glsl:599-611, using the documented 1/x fallback)."""
    scaling = 1.0 / (jnp.abs(rhs[..., 0]) + jnp.abs(rhs[..., 1]))
    scaling = jnp.where(jnp.sum(rhs * semi_circle, axis=-1) >= 0.0,
                        scaling, -scaling)
    return scaling[..., None] * rhs


def _solve_homogeneous_quadratic(q00, q01, q10, q11):
    """Blinn's stable homogeneous quadratic root
    (polygon_sampling.glsl:625-630). quadratic[c][r] convention: GLSL
    mat2 is column-major; q_cr = quadratic[c][r]."""
    coeff_xy = 0.5 * (q01 + q10)
    sqrt_disc = jnp.sqrt(jnp.maximum(0.0, coeff_xy * coeff_xy - q00 * q11))
    scaled_root = jnp.abs(coeff_xy) + sqrt_disc
    root_pos = jnp.stack([scaled_root, -q00], axis=-1)
    root_neg = jnp.stack([q11, scaled_root], axis=-1)
    return jnp.where((coeff_xy >= 0.0)[..., None], root_pos, root_neg)


def _outer2(a, b):
    """outerProduct(a, b) entries in (q00, q01, q10, q11) = (col, row) terms:
    GLSL outerProduct(c, r): M[i][j] = c[j] * r[i] with M[col][row]."""
    # GLSL: outerProduct(u, v) = u * v^T with u as column: M_rc = u_r * v_c.
    # mat2 indexing M[c][r] = u_r * v_c.
    q00 = a[..., 0] * b[..., 0]  # M[0][0]
    q01 = a[..., 1] * b[..., 0]  # M[0][1] column 0, row 1
    q10 = a[..., 0] * b[..., 1]  # M[1][0]
    q11 = a[..., 1] * b[..., 1]  # M[1][1]
    return q00, q01, q10, q11


def sample_sector_between_ellipses(random_numbers, target_area, inner_ellipse,
                                   outer_ellipse, dir_0, dir_1,
                                   iteration_count: int = 2,
                                   biased: bool = False):
    """Uniform area sample between two ellipses inside a sector
    (polygon_sampling.glsl:645-739)."""
    q0 = normalize(dir_0)
    q2 = normalize(dir_1)
    q1 = q0 + q2

    nf = [[get_ellipse_normalized_direction_factor(inner_ellipse, q0),
           get_ellipse_direction_factor(inner_ellipse, q1),
           get_ellipse_normalized_direction_factor(inner_ellipse, q2)],
          [get_ellipse_normalized_direction_factor(outer_ellipse, q0),
           get_ellipse_direction_factor(outer_ellipse, q1),
           get_ellipse_normalized_direction_factor(outer_ellipse, q2)]]

    sector_areas = [nf[1][0] * nf[1][1] - nf[0][0] * nf[0][1],
                    nf[1][1] * nf[1][2] - nf[0][1] * nf[0][2]]

    target_quad_area = mix_fma(-sector_areas[0], sector_areas[1],
                               random_numbers[0])
    first_half = target_quad_area <= 0.0
    q2 = jnp.where(first_half, q0, q2)
    nf02 = jnp.where(first_half, nf[0][0], nf[0][2])
    nf12 = jnp.where(first_half, nf[1][0], nf[1][2])
    target_quad_area = target_quad_area + jnp.where(first_half,
                                                    sector_areas[0],
                                                    -sector_areas[1])
    target_quad_area = target_quad_area * jnp.abs(
        q1[0] * q2[1] - q1[1] * q2[0])

    quad_normal_inner = ellipse_transform(
        inner_ellipse, q1 * nf[0][1] + q2 * nf02)
    quad_normal_outer = ellipse_transform(
        outer_ellipse, q1 * nf[1][1] + q2 * nf12)
    quad_offset_inner = jnp.sum(quad_normal_inner * q1, axis=-1) * nf[0][1]
    quad_offset_outer = jnp.sum(quad_normal_outer * q1, axis=-1) * nf[1][1]

    a = (quad_offset_outer * nf12)[..., None] * rotate_90(q2)
    q00, q01, q10, q11 = _outer2(a, quad_normal_inner)
    b = (quad_offset_inner * nf02)[..., None] * rotate_90(q2) \
        + target_quad_area[..., None] * quad_normal_inner
    p00, p01, p10, p11 = _outer2(b, quad_normal_outer)
    current_dir = _solve_homogeneous_quadratic(q00 - p00, q01 - p01,
                                               q10 - p10, q11 - p11)

    if not biased:
        # Boundary random numbers would destabilize the iteration (glsl:702-707).
        acceptable_error = 1.0e-5
        stable = jnp.abs(random_numbers[0] - 0.5) <= 0.5 - acceptable_error
        inner_rsqrt_det = get_ellipse_rsqrt_det(inner_ellipse)
        outer_rsqrt_det = get_ellipse_rsqrt_det(outer_ellipse)
        for _ in range(iteration_count):
            new_dir = _normalize_approx_and_flip(current_dir, q1)
            inner_dir = ellipse_transform(inner_ellipse, new_dir)
            outer_dir = ellipse_transform(outer_ellipse, new_dir)
            det_dirs = jnp.maximum(0.0, jnp.sum(new_dir * rotate_90(q0), axis=-1))
            error = target_area - _area_between_from_tangents(
                inner_rsqrt_det,
                det_dirs / (inner_rsqrt_det * jnp.sum(q0 * inner_dir, axis=-1)),
                outer_rsqrt_det,
                det_dirs / (outer_rsqrt_det * jnp.sum(q0 * outer_dir, axis=-1)),
                biased)
            a00, a01, a10, a11 = _outer2(inner_dir - outer_dir, rotate_90(new_dir))
            b00, b01, b10, b11 = _outer2((2.0 * error)[..., None] * inner_dir,
                                         outer_dir)
            stepped = _solve_homogeneous_quadratic(a00 - b00, a01 - b01,
                                                   a10 - b10, a11 - b11)
            current_dir = jnp.where(stable[..., None], stepped, current_dir)

    current_dir = jnp.where(
        (jnp.sum(current_dir * q1, axis=-1) >= 0.0)[..., None],
        current_dir, -current_dir)
    inner_factor = 1.0 / get_ellipse_direction_factor_rsq(inner_ellipse, current_dir)
    outer_factor = 1.0 / get_ellipse_direction_factor_rsq(outer_ellipse, current_dir)
    radius = jnp.sqrt(mix_fma(inner_factor, outer_factor, random_numbers[1]))
    return current_dir * radius[..., None]


def _select_sector(polygon: ProjectedSolidAnglePolygon, target, num_sectors):
    """First sector whose cumulative PSA exceeds the target."""
    cum = cumsum_lanes(polygon.sector_psa)
    lanes = np.arange(MAXV)
    valid = lanes < num_sectors
    reached = (target < cum) & valid
    sel = first_true_lane(reached, num_sectors - 1)
    # pick_lane(cum, -1) == 0 for sel == 0, matching the reference's branch.
    remaining = target - pick_lane(cum, sel - 1)
    return sel, remaining


def sample_projected_solid_angle_polygon(polygon: ProjectedSolidAnglePolygon,
                                         random_numbers,
                                         biased: bool = False):
    """PSA-uniform sample on the upper hemisphere
    (polygon_sampling.glsl:749-805)."""
    target = random_numbers[0] * polygon.projected_solid_angle
    central = is_central_case(polygon)
    count = polygon.vertex_count

    # ---- central case -----------------------------------------------------
    sel_c, rem_c = _select_sector(polygon, target, count)
    outer_c = pick_lane(polygon.ellipses, sel_c)
    dir0_c = pick_lane(polygon.vertices, sel_c)
    sqrt_det = jnp.sqrt(get_ellipse_det(outer_c))
    angle = 2.0 * rem_c * sqrt_det
    dir_c = (jnp.cos(angle) * sqrt_det) * dir0_c \
        + jnp.sin(angle) * rotate_90(ellipse_transform(outer_c, dir0_c))
    dir_c = dir_c * jnp.sqrt(random_numbers[1] /
                             get_ellipse_direction_factor_rsq(outer_c, dir_c))

    # ---- decentral case ---------------------------------------------------
    sel_d, rem_d = _select_sector(polygon, target, count - 1)
    inner_d = pick_lane(polygon.sector_inner, sel_d)
    outer_d = pick_lane(polygon.sector_outer, sel_d)
    dir0_d = pick_lane(polygon.vertices, sel_d)
    dir1_d = pick_lane(polygon.vertices, sel_d + 1)
    sector_psa = pick_lane(polygon.sector_psa, sel_d)
    r0 = rem_d / jnp.where(sector_psa > 0.0, sector_psa, 1.0)
    rnd_d = jnp.stack([r0, random_numbers[1]])
    dir_d = sample_sector_between_ellipses(rnd_d, rem_d, inner_d, outer_d,
                                           dir0_d, dir1_d, 2, biased)

    sampled_xy = jnp.where(central, dir_c, dir_d)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - sampled_xy[0] * sampled_xy[0]
                             - sampled_xy[1] * sampled_xy[1]))
    return jnp.concatenate([sampled_xy, z[None]])


def compute_projected_solid_angle_polygon_sampling_error(
        polygon: ProjectedSolidAnglePolygon, random_numbers, sampled_dir):
    """Backward/scaled/forward error of the iterative inversion
    (polygon_sampling.glsl:823-883). Returns (3,) zeros in the central case."""
    target = random_numbers[0] * polygon.projected_solid_angle
    sel, remaining = _select_sector(polygon, target,
                                    polygon.vertex_count - 1)
    inner_e = pick_lane(polygon.sector_inner, sel)
    outer_e = pick_lane(polygon.sector_outer, sel)
    dir_0 = pick_lane(polygon.vertices, sel)

    sampled_psa = get_area_between_ellipses_in_sector(
        inner_e, get_ellipse_rsqrt_det(inner_e),
        outer_e, get_ellipse_rsqrt_det(outer_e),
        dir_0, sampled_dir[:2])
    scaled_backward_error = remaining - sampled_psa
    backward_error = scaled_backward_error / polygon.projected_solid_angle

    inner_dir = ellipse_transform(inner_e, sampled_dir[:2])
    outer_dir = ellipse_transform(outer_e, sampled_dir[:2])
    inner_factor = 1.0 / jnp.sum(sampled_dir[:2] * inner_dir)
    outer_factor = 1.0 / jnp.sum(sampled_dir[:2] * outer_dir)
    # constraint_matrix columns as in the GLSL, then transposed.
    col0 = 0.5 * (inner_factor - outer_factor) * rotate_90(sampled_dir[:2])
    col1 = ((1.0 - random_numbers[1]) / (inner_factor * inner_factor)) * inner_dir \
        + (random_numbers[1] / (outer_factor * outer_factor)) * outer_dir
    # After transpose: m = [[col0_x, col0_y], [col1_x, col1_y]]
    det = col0[0] * col1[1] - col0[1] * col1[0]
    deriv_xy = (1.0 / det) * jnp.stack([col1[1], -col0[1]])
    deriv_z = -jnp.sum(sampled_dir[:2] * deriv_xy) / sampled_dir[2]
    deriv = jnp.concatenate([deriv_xy, deriv_z[None]])
    forward_error = jnp.linalg.norm(deriv) * scaled_backward_error

    errors = jnp.stack([backward_error, scaled_backward_error, forward_error])
    return jnp.where(is_central_case(polygon), jnp.zeros(3, F32), errors)
