"""Structure-of-arrays (SoA) forms of the shading math for the fused
Pallas pixel-tile kernel.

The per-pixel modules (ops/clipping.py, ops/sampling.py, ops/brdf.py,
ops/ltc.py, ops/mis.py) are the cited, tested reference implementations;
they are vmapped over pixels by the plain XLA pipeline. This module
re-expresses the same math in the layout the TPU kernel needs:

- a per-pixel scalar is a PLANE: a (TH, TW) f32/bool array (the VPU tile);
- a 2/3-vector is a TUPLE of planes (component axis is python-level);
- a polygon is a python LIST of vector tuples (vertex lanes unrolled);
- every structural index (lane, component, sample) is STATIC, so the
  whole clip -> prepare -> sample -> estimate chain lowers to pure
  elementwise VPU ops with zero gathers/sorts/reshapes -- the property
  that lets Mosaic keep the entire chain in VMEM, like the reference
  keeps it in registers (shading_pass.frag.glsl:329-711).

Each function cites the per-pixel twin it must agree with;
tests/test_fused.py asserts the agreement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .math_utils import F32, M_HALF_PI, M_PI, _two_product, fast_positive_atan

_INF = np.float32(np.inf)

# ---------------------------------------------------------------------------
# Plane/vector helpers
# ---------------------------------------------------------------------------


def wh(c, a, b):
    return jnp.where(c, a, b)


def vwh(c, a, b):
    """Component-wise where over vector tuples."""
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


def vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def vscale(s, a):
    return tuple(s * x for x in a)


def vdot(a, b):
    acc = a[0] * b[0]
    for x, y in zip(a[1:], b[1:]):
        acc = acc + x * y
    return acc


def vneg(a):
    return tuple(-x for x in a)


def vnormalize(a):
    rl = jax.lax.rsqrt(vdot(a, a))
    return vscale(rl, a)


def kahan_soa(a, b, c, d):
    """a*b - c*d via error-free two_product (ops/math_utils.py kahan)."""
    p1, e1 = _two_product(a, b)
    p2, e2 = _two_product(c, d)
    return (p1 - p2) + (e1 - e2)


def cross3(a, b):
    """Stable cross product (ops/math_utils.py cross_stable)."""
    return (kahan_soa(a[1], b[2], a[2], b[1]),
            kahan_soa(a[2], b[0], a[0], b[2]),
            kahan_soa(a[0], b[1], a[1], b[0]))


def cross3_fast(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def rot90(v):
    """(x, y) -> (-y, x) (ops/sampling.py rotate_90)."""
    return (-v[1], v[0])


def mix_fma(x, y, a):
    return a * y + (x - a * x)


def signbit_soa(x):
    bits = jax.lax.bitcast_convert_type(jnp.asarray(x, F32), jnp.int32)
    return bits < 0


def atan_soa(x):
    """Cephes single-precision atan (ops/math_utils.py atan_f32)."""
    ax = jnp.abs(x)
    big = ax > np.float32(2.414213562373095)
    mid = (ax > np.float32(0.4142135623730950)) & ~big
    safe_ax = jnp.where(ax > 0.0, ax, 1.0)
    r = jnp.where(big, -1.0 / jnp.where(big, safe_ax, 1.0),
                  jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    offset = jnp.where(big, np.float32(M_HALF_PI),
                       jnp.where(mid, np.float32(0.25 * M_PI),
                                 np.float32(0.0)))
    z = r * r
    p = z * np.float32(8.05374449538e-2) - np.float32(1.38776856032e-1)
    p = z * p + np.float32(1.99777106478e-1)
    p = z * p - np.float32(3.33329491539e-1)
    y = offset + (z * p * r + r)
    return jnp.where(x < 0.0, -y, y)


def positive_atan_soa(t, biased: bool):
    if biased:
        return fast_positive_atan(t)
    return atan_soa(t) + jnp.where(t < 0.0, np.float32(M_PI),
                                   np.float32(0.0))


def acos_soa(x):
    """jnp.arccos twin: acos(x) = atan2(sqrt(1-x^2), x). The acos
    primitive has no Pallas TPU lowering (measured on v5e in the Urena
    kernel)."""
    return atan2_soa(jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x)), x)


def atan2_soa(y, x):
    """jnp.arctan2 twin built on atan_soa: the atan2 primitive has no
    Pallas TPU lowering (measured NotImplementedError on v5e), so every
    in-kernel azimuth must come through here."""
    safe_x = jnp.where(x != 0.0, x, 1.0)
    base = atan_soa(y / safe_x)
    # x < 0: shift by +/- pi toward y's sign (arctan2(+-0, -1) = +-pi).
    neg_y = (y < 0.0) | (jnp.signbit(y) & (y == 0.0))
    pi = np.float32(M_PI)
    shifted = base + jnp.where(neg_y, -pi, pi)
    res = jnp.where(x > 0.0, base, shifted)
    on_axis = jnp.where(y == 0.0,
                        jnp.where(x >= 0.0, 0.0,
                                  jnp.where(neg_y, -pi, pi)),
                        jnp.where(y > 0.0, np.float32(M_HALF_PI),
                                  np.float32(-M_HALF_PI)))
    return jnp.where(x == 0.0,
                     jnp.where(y == 0.0, jnp.zeros_like(base), on_axis),
                     jnp.where(y == 0.0, on_axis, res))


# ---------------------------------------------------------------------------
# Polygon clipping to z >= 0 (twin of ops/clipping.py clip_polygon;
# reference semantics polygon_clipping.glsl:19-225)
# ---------------------------------------------------------------------------


def clip_soa(verts, n: int):
    """Clip a convex polygon with STATIC input vertex count n to z >= 0.

    verts: list of n vec3 tuples (planes). Returns (out, count) where out
    is a list of n+1 vec3 tuples (first vertex repeated in unused lanes,
    zeros when fully clipped) and count is an int32 plane in {0, 3..n+1}.
    """
    above = [verts[k][2] > 0.0 for k in range(n)]
    zero = jnp.zeros_like(verts[0][0])
    isect = []
    emit_int = []
    for k in range(n):
        v0, v1 = verts[k], verts[(k + 1) % n]
        crosses = above[k] != above[(k + 1) % n]
        emit_int.append(crosses)
        denom = v0[2] - v1[2]
        t = v0[2] / jnp.where(crosses, denom, 1.0)
        ix = t * v1[0] + (v0[0] - t * v0[0])
        iy = t * v1[1] + (v0[1] - t * v0[1])
        isect.append((ix, iy, zero))

    cur_i = [above[k].astype(jnp.int32) for k in range(n)]
    int_i = [emit_int[k].astype(jnp.int32) for k in range(n)]
    offsets = []
    running = jnp.zeros_like(cur_i[0])
    for k in range(n):
        offsets.append(running)
        running = running + cur_i[k] + int_i[k]
    total = running

    m = n + 1
    zero3 = (zero, zero, zero)
    out = []
    for j in range(m):
        acc = zero3
        for k in range(n):
            sel_cur = above[k] & (offsets[k] == j)
            acc = vadd(acc, vwh(sel_cur, verts[k], zero3))
            sel_int = emit_int[k] & (offsets[k] + cur_i[k] == j)
            acc = vadd(acc, vwh(sel_int, isect[k], zero3))
        out.append(acc)

    count = jnp.where(total >= 3, total, 0)
    for j in range(1, m):
        out[j] = vwh(j >= count, out[0], out[j])
    return out, count


# ---------------------------------------------------------------------------
# Ellipse helpers (twins of ops/sampling.py:150-220;
# reference polygon_sampling.glsl:236-412)
# ---------------------------------------------------------------------------


def ellipse_from_edge_soa(v0, v1):
    n = cross3(v0, v1)
    nz_ok = n[2] != 0.0
    scaling = 1.0 / jnp.where(nz_ok, n[2], 1.0)
    scaling = jnp.where(signbit_soa(n[0]), -scaling, scaling)
    ex = jnp.where(nz_ok, n[0] * scaling, _INF)
    return (ex, n[1] * scaling)


def ellipse_transform_soa(e, p):
    d = e[0] * p[0] + e[1] * p[1]
    return (d * e[0] + p[0], d * e[1] + p[1])


def ellipse_det_soa(e):
    return e[0] * e[0] + e[1] * e[1] + 1.0


def ellipse_rsqrt_det_soa(e):
    return jax.lax.rsqrt(ellipse_det_soa(e))


def ellipse_dir_factor_rsq_soa(e, d):
    ed = e[0] * d[0] + e[1] * d[1]
    return ed * ed + d[0] * d[0] + d[1] * d[1]


def ellipse_dir_factor_soa(e, d):
    return jax.lax.rsqrt(ellipse_dir_factor_rsq_soa(e, d))


def ellipse_normalized_dir_factor_soa(e, d):
    ed = e[0] * d[0] + e[1] * d[1]
    return jax.lax.rsqrt(ed * ed + 1.0)


def _area_between_from_tangents_soa(inner_rsd, inner_tan, outer_rsd,
                                    outer_tan, biased):
    inner_area = inner_rsd * positive_atan_soa(inner_tan, biased)
    result = outer_rsd * positive_atan_soa(outer_tan, biased) - inner_area
    return jnp.where(result > 0.0, 0.5 * result, 0.0)


def area_between_ellipses_in_sector_soa(inner_e, inner_rsd, outer_e,
                                        outer_rsd, d0, d1, biased):
    det_dirs = jnp.maximum(0.0, d1[0] * (-d0[1]) + d1[1] * d0[0])
    it = ellipse_transform_soa(inner_e, d1)
    ot = ellipse_transform_soa(outer_e, d1)
    inner_dot = inner_rsd * (d0[0] * it[0] + d0[1] * it[1])
    outer_dot = outer_rsd * (d0[0] * ot[0] + d0[1] * ot[1])
    return _area_between_from_tangents_soa(
        inner_rsd, det_dirs / inner_dot, outer_rsd, det_dirs / outer_dot,
        biased)


def ellipse_area_in_sector_soa(e, d0, d1, biased):
    rsd = ellipse_rsqrt_det_soa(e)
    det_dirs = jnp.maximum(0.0, d1[0] * (-d0[1]) + d1[1] * d0[0])
    et = ellipse_transform_soa(e, d1)
    e_dot = rsd * (d0[0] * et[0] + d0[1] * et[1])
    area = 0.5 * rsd * positive_atan_soa(det_dirs / e_dot, biased)
    return jnp.where(rsd > 0.0, area, 0.0)


# ---------------------------------------------------------------------------
# PSA sampling preparation (twin of ops/sampling.py
# prepare_projected_solid_angle_polygon_sampling;
# reference polygon_sampling.glsl:521-589)
# ---------------------------------------------------------------------------


class PsaPolySoa:
    """Prepared PSA polygon, SoA: lists of planes/tuples."""
    __slots__ = ("m", "count", "vertices", "ellipses", "inner0",
                 "sector_inner", "sector_outer", "sector_psa", "psa",
                 "central")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def prepare_psa_soa(verts, count, m: int, biased: bool):
    """verts: list of m vec3 tuples (clip_soa output, padded with v0);
    count: int32 plane in {0, 3..m}. The count==0 (fully clipped) case is
    gated by the caller via psa == 0."""
    count = jnp.maximum(count, 3)
    zero = jnp.zeros_like(verts[0][0])
    active = [k < count for k in range(m)]

    raw = [ellipse_from_edge_soa(verts[k], verts[(k + 1) % m])
           for k in range(m)]
    raw_inner = [signbit_soa(raw[k][0]) for k in range(m)]

    # Lane k's previous edge: lane count-1 for k == 0, else k-1.
    last_raw = (zero, zero)
    last_inner = jnp.zeros_like(active[0])
    for k in range(m):
        is_last = count - 1 == k
        last_raw = vwh(is_last, raw[k], last_raw)
        last_inner = (is_last & raw_inner[k]) | (~is_last & last_inner)
    prev_raw = [last_raw] + raw[:-1]
    prev_inner = [last_inner] + raw_inner[:-1]

    ellipses = [vwh(raw_inner[k], prev_raw[k], raw[k]) for k in range(m)]

    # First inner->outer transition records the dropped inner ellipse.
    picked = (zero, zero)
    seen = jnp.zeros_like(active[0])
    for k in range(m):
        trans = active[k] & prev_inner[k] & ~raw_inner[k]
        first = trans & ~seen
        picked = vwh(first, prev_raw[k], picked)
        seen = seen | trans
    one = jnp.ones_like(zero)
    inner0 = vwh(seen, picked, (one, zero))
    central = inner0[0] > 0.0

    v_xy = [(verts[k][0], verts[k][1]) for k in range(m)]

    # --- central case ------------------------------------------------------
    central_psa = [
        jnp.where(active[k],
                  ellipse_area_in_sector_soa(ellipses[k], v_xy[k],
                                             v_xy[(k + 1) % m], biased),
                  0.0)
        for k in range(m)]

    # --- decentral case: ccw sort by pseudo-angle, then sector walk --------
    # Pseudo-angle: monotonic in atan2(cross, dot), tie-preserving
    # (ops/sampling.py _sort_convex_polygon_vertices).
    keys = []
    for k in range(m):
        cr = kahan_soa(v_xy[0][0], v_xy[k][1], v_xy[0][1], v_xy[k][0])
        dt = v_xy[0][0] * v_xy[k][0] + v_xy[0][1] * v_xy[k][1]
        p = dt / (jnp.abs(dt) + jnp.abs(cr) + np.float32(1e-37))
        key = jnp.where(cr >= 0.0, 1.0 - p, p - 1.0)
        keys.append(jnp.where(active[k], key, np.float32(4.0)))
    rank = []
    for k in range(m):
        r = jnp.zeros_like(count)
        for j in range(m):
            before = (keys[j] < keys[k]) if j != k else None
            if j < k:
                before = (keys[j] < keys[k]) | (keys[j] == keys[k])
            elif j > k:
                before = keys[j] < keys[k]
            else:
                continue
            r = r + before.astype(jnp.int32)
        rank.append(r)
    sorted_v = []
    sorted_e = []
    zero2 = (zero, zero)
    for j in range(m):
        av = zero2
        ae = zero2
        for k in range(m):
            sel = rank[k] == j
            av = vwh(sel, v_xy[k], av)
            ae = vwh(sel, ellipses[k], ae)
        sorted_v.append(av)
        # " + 0.0" canonicalizes -0.0 to +0.0, matching the per-pixel
        # path's masked-SUM permutation (ops/sampling.py
        # _sort_convex_polygon_vertices): the sign bit of a horizon
        # ellipse's x decides inner/outer in the sector walk below.
        sorted_e.append((ae[0] + 0.0, ae[1] + 0.0))

    inner_e = inner0
    outer_e = sorted_e[0]
    sector_inner = []
    sector_outer = []
    for i in range(m - 1):
        if i > 0:
            is_inner = signbit_soa(sorted_e[i][0])
            inner_e = vwh(is_inner, sorted_e[i], inner_e)
            outer_e = vwh(is_inner, outer_e, sorted_e[i])
        sector_inner.append(inner_e)
        sector_outer.append(outer_e)
    sector_inner.append(sector_inner[-1])
    sector_outer.append(sector_outer[-1])

    decentral_psa = []
    for i in range(m):
        if i < m - 1:
            a = area_between_ellipses_in_sector_soa(
                sector_inner[i], ellipse_rsqrt_det_soa(sector_inner[i]),
                sector_outer[i], ellipse_rsqrt_det_soa(sector_outer[i]),
                sorted_v[i], sorted_v[i + 1], biased)
            decentral_psa.append(jnp.where(i < count - 1, a, 0.0))
        else:
            decentral_psa.append(zero)

    out_v = [vwh(central, v_xy[k], sorted_v[k]) for k in range(m)]
    out_e = [vwh(central, ellipses[k], sorted_e[k]) for k in range(m)]
    sector_psa = [jnp.where(central, central_psa[k], decentral_psa[k])
                  for k in range(m)]
    psa = sector_psa[0]
    for k in range(1, m):
        psa = psa + sector_psa[k]

    return PsaPolySoa(m=m, count=count, vertices=out_v, ellipses=out_e,
                      inner0=inner0, sector_inner=sector_inner,
                      sector_outer=sector_outer, sector_psa=sector_psa,
                      psa=psa, central=central)


# ---------------------------------------------------------------------------
# PSA sampling (twin of ops/sampling.py sample_projected_solid_angle_polygon;
# reference polygon_sampling.glsl:595-805)
# ---------------------------------------------------------------------------


def _solve_homogeneous_quadratic_soa(q00, q01, q10, q11):
    coeff_xy = 0.5 * (q01 + q10)
    sqrt_disc = jnp.sqrt(jnp.maximum(0.0, coeff_xy * coeff_xy - q00 * q11))
    scaled_root = jnp.abs(coeff_xy) + sqrt_disc
    pos = coeff_xy >= 0.0
    return (jnp.where(pos, scaled_root, q11),
            jnp.where(pos, -q00, scaled_root))


def _outer2_soa(a, b):
    return a[0] * b[0], a[1] * b[0], a[0] * b[1], a[1] * b[1]


def _normalize_approx_and_flip_soa(rhs, semi_circle):
    scaling = 1.0 / (jnp.abs(rhs[0]) + jnp.abs(rhs[1]))
    scaling = jnp.where(rhs[0] * semi_circle[0] + rhs[1] * semi_circle[1]
                        >= 0.0, scaling, -scaling)
    return (scaling * rhs[0], scaling * rhs[1])


def sample_sector_between_ellipses_soa(r0, r1, target_area, inner_e, outer_e,
                                       dir_0, dir_1, iteration_count: int,
                                       biased: bool):
    """Twin of ops/sampling.py sample_sector_between_ellipses
    (polygon_sampling.glsl:645-739). All args are planes/vec2 tuples."""
    def norm2(v):
        rl = jax.lax.rsqrt(v[0] * v[0] + v[1] * v[1])
        return (v[0] * rl, v[1] * rl)

    q0 = norm2(dir_0)
    q2 = norm2(dir_1)
    q1 = vadd(q0, q2)

    nf = [[ellipse_normalized_dir_factor_soa(inner_e, q0),
           ellipse_dir_factor_soa(inner_e, q1),
           ellipse_normalized_dir_factor_soa(inner_e, q2)],
          [ellipse_normalized_dir_factor_soa(outer_e, q0),
           ellipse_dir_factor_soa(outer_e, q1),
           ellipse_normalized_dir_factor_soa(outer_e, q2)]]

    sector_areas = [nf[1][0] * nf[1][1] - nf[0][0] * nf[0][1],
                    nf[1][1] * nf[1][2] - nf[0][1] * nf[0][2]]

    target_quad_area = mix_fma(-sector_areas[0], sector_areas[1], r0)
    first_half = target_quad_area <= 0.0
    q2 = vwh(first_half, q0, q2)
    nf02 = jnp.where(first_half, nf[0][0], nf[0][2])
    nf12 = jnp.where(first_half, nf[1][0], nf[1][2])
    target_quad_area = target_quad_area + jnp.where(
        first_half, sector_areas[0], -sector_areas[1])
    target_quad_area = target_quad_area * jnp.abs(
        q1[0] * q2[1] - q1[1] * q2[0])

    quad_normal_inner = ellipse_transform_soa(
        inner_e, (q1[0] * nf[0][1] + q2[0] * nf02,
                  q1[1] * nf[0][1] + q2[1] * nf02))
    quad_normal_outer = ellipse_transform_soa(
        outer_e, (q1[0] * nf[1][1] + q2[0] * nf12,
                  q1[1] * nf[1][1] + q2[1] * nf12))
    quad_offset_inner = (quad_normal_inner[0] * q1[0]
                         + quad_normal_inner[1] * q1[1]) * nf[0][1]
    quad_offset_outer = (quad_normal_outer[0] * q1[0]
                         + quad_normal_outer[1] * q1[1]) * nf[1][1]

    r90q2 = rot90(q2)
    a = vscale(quad_offset_outer * nf12, r90q2)
    q00, q01, q10, q11 = _outer2_soa(a, quad_normal_inner)
    b = vadd(vscale(quad_offset_inner * nf02, r90q2),
             vscale(target_quad_area, quad_normal_inner))
    p00, p01, p10, p11 = _outer2_soa(b, quad_normal_outer)
    current_dir = _solve_homogeneous_quadratic_soa(
        q00 - p00, q01 - p01, q10 - p10, q11 - p11)

    if not biased:
        acceptable_error = np.float32(1.0e-5)
        stable = jnp.abs(r0 - 0.5) <= 0.5 - acceptable_error
        inner_rsd = ellipse_rsqrt_det_soa(inner_e)
        outer_rsd = ellipse_rsqrt_det_soa(outer_e)
        r90q0 = rot90(q0)
        for _ in range(iteration_count):
            new_dir = _normalize_approx_and_flip_soa(current_dir, q1)
            inner_dir = ellipse_transform_soa(inner_e, new_dir)
            outer_dir = ellipse_transform_soa(outer_e, new_dir)
            det_dirs = jnp.maximum(
                0.0, new_dir[0] * r90q0[0] + new_dir[1] * r90q0[1])
            error = target_area - _area_between_from_tangents_soa(
                inner_rsd,
                det_dirs / (inner_rsd * (q0[0] * inner_dir[0]
                                         + q0[1] * inner_dir[1])),
                outer_rsd,
                det_dirs / (outer_rsd * (q0[0] * outer_dir[0]
                                         + q0[1] * outer_dir[1])),
                biased)
            a00, a01, a10, a11 = _outer2_soa(vsub(inner_dir, outer_dir),
                                             rot90(new_dir))
            b00, b01, b10, b11 = _outer2_soa(vscale(2.0 * error, inner_dir),
                                             outer_dir)
            stepped = _solve_homogeneous_quadratic_soa(
                a00 - b00, a01 - b01, a10 - b10, a11 - b11)
            current_dir = vwh(stable, stepped, current_dir)

    flip_ok = (current_dir[0] * q1[0] + current_dir[1] * q1[1]) >= 0.0
    current_dir = vwh(flip_ok, current_dir, vneg(current_dir))
    inner_factor = 1.0 / ellipse_dir_factor_rsq_soa(inner_e, current_dir)
    outer_factor = 1.0 / ellipse_dir_factor_rsq_soa(outer_e, current_dir)
    radius = jnp.sqrt(mix_fma(inner_factor, outer_factor, r1))
    return vscale(radius, current_dir)


def _select_sector_soa(sector_psa, target, num_sectors, m: int):
    """One-hot select of the first sector whose cumulative PSA exceeds the
    target (ops/sampling.py _select_sector). Returns (sel list of bool
    planes, remaining plane)."""
    cum = []
    running = jnp.zeros_like(target)
    prev = []
    for k in range(m):
        prev.append(running)
        running = running + sector_psa[k]
        cum.append(running)
    any_before = jnp.zeros_like(target < 0.0)
    sel = []
    any_reached = jnp.zeros_like(any_before)
    for k in range(m):
        reached = (target < cum[k]) & (k < num_sectors)
        first = reached & ~any_before
        sel.append(first)
        any_before = any_before | reached
    any_reached = any_before
    # Fallback: last valid sector.
    for k in range(m):
        fallback = num_sectors - 1 == k
        sel[k] = (any_reached & sel[k]) | (~any_reached & fallback)
    remaining = jnp.zeros_like(target)
    for k in range(m):
        remaining = remaining + jnp.where(sel[k], target - prev[k], 0.0)
    return sel, remaining


def _pick(sel, values, zero_like):
    acc = zero_like
    for s, v in zip(sel, values):
        acc = jnp.where(s, v, acc)
    return acc


def _pick_v(sel, values):
    acc = tuple(jnp.zeros_like(c) for c in values[0])
    for s, v in zip(sel, values):
        acc = vwh(s, v, acc)
    return acc


def sample_psa_soa(poly: PsaPolySoa, r0, r1, biased: bool):
    """Twin of ops/sampling.py sample_projected_solid_angle_polygon.
    Returns a vec3 tuple (x, y, z)."""
    m = poly.m
    target = r0 * poly.psa

    # --- central case --------------------------------------------------
    sel_c, rem_c = _select_sector_soa(poly.sector_psa, target, poly.count, m)
    outer_c = _pick_v(sel_c, poly.ellipses)
    dir0_c = _pick_v(sel_c, poly.vertices)
    sqrt_det = jnp.sqrt(ellipse_det_soa(outer_c))
    angle = 2.0 * rem_c * sqrt_det
    t0 = ellipse_transform_soa(outer_c, dir0_c)
    r90 = rot90(t0)
    ca = jnp.cos(angle) * sqrt_det
    sa = jnp.sin(angle)
    dir_c = (ca * dir0_c[0] + sa * r90[0], ca * dir0_c[1] + sa * r90[1])
    dir_c = vscale(jnp.sqrt(
        r1 / ellipse_dir_factor_rsq_soa(outer_c, dir_c)), dir_c)

    # --- decentral case --------------------------------------------------
    sel_d, rem_d = _select_sector_soa(poly.sector_psa, target,
                                      poly.count - 1, m)
    inner_d = _pick_v(sel_d, poly.sector_inner)
    outer_d = _pick_v(sel_d, poly.sector_outer)
    dir0_d = _pick_v(sel_d, poly.vertices)
    dir1_d = _pick_v(sel_d, poly.vertices[1:] + poly.vertices[:1])
    sector_psa = _pick(sel_d, poly.sector_psa, jnp.zeros_like(target))
    rr0 = rem_d / jnp.where(sector_psa > 0.0, sector_psa, 1.0)
    dir_d = sample_sector_between_ellipses_soa(
        rr0, r1, rem_d, inner_d, outer_d, dir0_d, dir1_d, 2, biased)

    x = jnp.where(poly.central, dir_c[0], dir_d[0])
    y = jnp.where(poly.central, dir_c[1], dir_d[1])
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return (x, y, z)


# ---------------------------------------------------------------------------
# BRDF (twin of ops/brdf.py evaluate_brdf; reference brdfs.glsl:57-88)
# ---------------------------------------------------------------------------


def fresnel_schlick_soa(f0, f90, cos_theta):
    flipped = 1.0 - cos_theta
    fsq = flipped * flipped
    return f0 + (f90 - f0) * (fsq * flipped * fsq)


def evaluate_brdf_soa(normal, outgoing, lambert_out, diffuse_albedo,
                      fresnel_0, roughness, incoming,
                      diffuse: bool, specular: bool):
    """Returns a vec3 tuple; all inputs are planes/tuples."""
    half = vnormalize(vadd(incoming, outgoing))
    lambert_in = vdot(normal, incoming)
    out_dot_half = vdot(outgoing, half)
    brdf = (jnp.zeros_like(lambert_in),) * 3

    if diffuse:
        f90 = out_dot_half * out_dot_half * (2.0 * roughness) + 0.5
        f_out = fresnel_schlick_soa(np.float32(1.0), f90, lambert_out)
        f_in = fresnel_schlick_soa(np.float32(1.0), f90, lambert_in)
        ff = f_out * f_in
        brdf = vadd(brdf, vscale(ff, diffuse_albedo))

    if specular:
        ndh = vdot(normal, half)
        r_sq = roughness * roughness
        ggx = (ndh * r_sq - ndh) * ndh + 1.0
        ggx = r_sq / (ggx * ggx)
        lo = lambert_out
        masking = lambert_in * jnp.sqrt((-lo * r_sq + lo) * lo + r_sq)
        shadowing = lo * jnp.sqrt(
            (-lambert_in * r_sq + lambert_in) * lambert_in + r_sq)
        smith = 0.5 / (masking + shadowing)
        codh = jnp.clip(out_dot_half, 0.0, 1.0)
        fr = tuple(fresnel_schlick_soa(f, np.float32(1.0), codh)
                   for f in fresnel_0)
        brdf = vadd(brdf, vscale(ggx * smith, fr))

    inv_pi = np.float32(1.0 / M_PI)
    return vscale(inv_pi, brdf)


# ---------------------------------------------------------------------------
# LTC density (twin of ops/ltc.py evaluate_ltc_density;
# reference ltc_utility.glsl:103-108)
# ---------------------------------------------------------------------------


def ltc_density_soa(s2c, det, dir_shading, rcp_psa):
    """s2c: 9 planes row-major (3x3 shading->cosine), det: plane,
    dir_shading: vec3 tuple."""
    dx = (s2c[0] * dir_shading[0] + s2c[1] * dir_shading[1]
          + s2c[2] * dir_shading[2])
    dy = (s2c[3] * dir_shading[0] + s2c[4] * dir_shading[1]
          + s2c[5] * dir_shading[2])
    dz = (s2c[6] * dir_shading[0] + s2c[7] * dir_shading[1]
          + s2c[8] * dir_shading[2])
    len_sq = dx * dx + dy * dy + dz * dz
    density = jnp.maximum(0.0, dz) * det / (len_sq * len_sq)
    return density * rcp_psa


# ---------------------------------------------------------------------------
# MIS estimators (twin of ops/mis.py; reference
# shading_pass.frag.glsl:243-293). Weights may be vec3 tuples, densities
# are planes; returns a vec3 tuple.
# ---------------------------------------------------------------------------


def mis_estimate_soa(heuristic: str, integrand, sampled_weight,
                     sampled_density, other_weight, other_density,
                     visibility_estimate):
    if heuristic == "weighted":
        wsum = vadd(vscale(sampled_density, sampled_weight),
                    vscale(other_density, other_weight))
        return tuple(sw * i / ws for sw, i, ws in
                     zip(sampled_weight, integrand, wsum))
    if heuristic in ("optimal_clamped", "optimal"):
        balance = 1.0 / (sampled_density + other_density)
        wsum = vadd(vscale(sampled_density, sampled_weight),
                    vscale(other_density, other_weight))
        if heuristic == "optimal_clamped":
            out = []
            for sw, ws, i in zip(sampled_weight, wsum, integrand):
                weighted_wod = sw / ws
                mixed = -visibility_estimate * balance + balance
                mixed = visibility_estimate * weighted_wod + mixed
                out.append(mixed * i)
            return tuple(out)
        return tuple(visibility_estimate * sw
                     + balance * (i - visibility_estimate * ws)
                     for sw, ws, i in zip(sampled_weight, wsum, integrand))
    if heuristic == "balance":
        wod = 1.0 / (sampled_density + other_density)
    elif heuristic == "power":
        wod = sampled_density / (sampled_density * sampled_density
                                 + other_density * other_density)
    else:
        raise ValueError(heuristic)
    return vscale(wod, integrand)
