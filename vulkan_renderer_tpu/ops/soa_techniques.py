"""SoA ports of the remaining polygon-sampling techniques for the fused
Pallas shading kernel (render/fused.py).

Each function is the structure-of-arrays twin of a per-pixel reference
implementation (ops/sampling.py, ops/sampling_related.py,
render/shading.py); "planes" are jnp arrays of one whole pixel tile, vec3s
are 3-tuples of planes, and light data arrives as traced SMEM scalars.
Loops over fan triangles/vertices are STATIC (the fused path requires
static per-light vertex counts), so the masked-lane machinery of the
vmapped path collapses into unrolled compare/select chains.

Reference lines are cited per function for parity checking (the GLSL is
src/shaders/polygon_sampling_related_work.glsl unless noted).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .soa import (acos_soa, atan2_soa, cross3, mix_fma, positive_atan_soa, vadd, vdot,
                  vnormalize,
                  vscale, vsub, vwh, wh)

F = np.float32
_PI = F(np.pi)


def _vec(x, y, z):
    return (x, y, z)


def _clip01(x):
    return jnp.clip(x, 0.0, 1.0)


# ===========================================================================
# Solid-angle triangle fans (ours): ops/sampling.py:58-130,
# polygon_sampling.glsl:120-224
# ===========================================================================

class SaPolySoa:
    """Prepared fan: per-triangle params + cumulative solid angles.

    dirs: list of m vec3 planes; params[i] = (simplex_volume,
    dot_0_2_plus_1_2, one_plus_dot_0_1); fan[i] = cumulative solid angle
    through triangle i; active[i] = per-pixel mask (None = always)."""

    def __init__(self, dirs, params, fan, active, solid_angle):
        self.dirs = dirs
        self.params = params
        self.fan = fan
        self.active = active
        self.solid_angle = solid_angle


def prepare_sa_soa(dirs, count, m: int, biased: bool = False) -> SaPolySoa:
    """dirs: m normalized vec3 planes (first-vertex padding in unused
    slots); count: int plane for the per-pixel vertex count or None when
    all m are active (static-count lights)."""
    d0 = dirs[0]
    hh_sign = wh(d0[0] > 0.0, F(-1.0), F(1.0))
    rcp = 1.0 / (jnp.abs(d0[0]) + 1.0)
    hy = d0[1] * rcp
    hz = d0[2] * rcp

    params, fan, active = [], [], []
    cum = None
    for i in range(m - 2):
        v0 = dirs[i + 1]
        v2 = dirs[i + 2]
        dot01 = vdot(v0, d0)
        dot02 = vdot(v0, v2)
        dot12 = vdot(d0, v2)
        dh0 = -hh_sign * v0[0] + dot01
        dh2 = -hh_sign * v2[0] + dot12
        col00 = -dh0 * hy + v0[1]
        col01 = -dh0 * hz + v0[2]
        col10 = -dh2 * hy + v2[1]
        col11 = -dh2 * hz + v2[2]
        simplex = jnp.abs(col00 * col11 - col01 * col10)
        d02p12 = dot02 + dot12
        opd01 = 1.0 + dot01
        tangent = simplex / (opd01 + d02p12)
        sa_i = 2.0 * positive_atan_soa(tangent, biased)
        if count is None:
            act = None
        else:
            act = (i + 2) < jnp.maximum(count, 3)
            sa_i = jnp.where(act, sa_i, 0.0)
        params.append((simplex, d02p12, opd01))
        active.append(act)
        cum = sa_i if cum is None else cum + sa_i
        fan.append(cum)
    return SaPolySoa(dirs, params, fan, active, cum)


def _select_fan(poly: SaPolySoa, target, m: int):
    """First fan triangle whose cumulative angle reaches target (default:
    last active). Returns (params, prev_fan, v0, v2) as selected planes."""
    nt = m - 2
    # Reverse sweep on the reach condition: the earliest satisfying
    # triangle wins; defaults hold the last triangle's values
    # (ops/sampling.py:107-117 first_true_lane semantics).
    sel_p = poly.params[nt - 1]
    sel_prev = poly.fan[nt - 2] if nt >= 2 else jnp.zeros_like(target)
    sel_v0 = poly.dirs[nt]
    sel_v2 = poly.dirs[nt + 1]
    for i in range(nt - 2, -1, -1):
        reach = poly.fan[i] >= target
        if poly.active[i] is not None:
            reach = reach & poly.active[i]
        sel_p = tuple(jnp.where(reach, a, b)
                      for a, b in zip(poly.params[i], sel_p))
        prev = poly.fan[i - 1] if i >= 1 else jnp.zeros_like(target)
        sel_prev = jnp.where(reach, prev, sel_prev)
        sel_v0 = vwh(reach, poly.dirs[i + 1], sel_v0)
        sel_v2 = vwh(reach, poly.dirs[i + 2], sel_v2)
    # When even the last active triangle does not reach the target (only
    # possible through fp slop or count < 3), the defaults above already
    # hold the last ACTIVE values only when count is static; with dynamic
    # counts replace by the last active triangle's values.
    if poly.active[nt - 1] is not None:
        run_p, run_prev = sel_p, sel_prev
        last_p = poly.params[0]
        last_prev = jnp.zeros_like(target)
        last_v0 = poly.dirs[1]
        last_v2 = poly.dirs[2]
        for i in range(1, nt):
            act = poly.active[i]
            last_p = tuple(jnp.where(act, a, b)
                           for a, b in zip(poly.params[i], last_p))
            last_prev = jnp.where(act, poly.fan[i - 1], last_prev)
            last_v0 = vwh(act, poly.dirs[i + 1], last_v0)
            last_v2 = vwh(act, poly.dirs[i + 2], last_v2)
        any_reach = None
        for i in range(nt):
            r = poly.fan[i] >= target
            if poly.active[i] is not None:
                r = r & poly.active[i]
            any_reach = r if any_reach is None else (any_reach | r)
        sel_p = tuple(jnp.where(any_reach, a, b)
                      for a, b in zip(run_p, last_p))
        sel_prev = jnp.where(any_reach, run_prev, last_prev)
        sel_v0 = vwh(any_reach, sel_v0, last_v0)
        sel_v2 = vwh(any_reach, sel_v2, last_v2)
    return sel_p, sel_prev, sel_v0, sel_v2


def sample_sa_soa(poly: SaPolySoa, r0, r1, m: int):
    """ops/sampling.py:101-130 (polygon_sampling.glsl:194-224)."""
    target = poly.solid_angle * r0
    params, prev_fan, v0, v2 = _select_fan(poly, target, m)
    v1 = poly.dirs[0]
    sub = target - prev_fan
    cos_h = jnp.cos(0.5 * sub)
    sin_h = jnp.sin(0.5 * sub)
    s0 = params[0] * cos_h - params[1] * sin_h
    s2 = params[2] * sin_h
    offset = vadd(vscale(s0, v0), vscale(s2, v2))
    off_sq = vdot(offset, offset)
    scale = 2.0 * vdot(v0, offset) / jnp.where(off_sq != 0.0, off_sq, 1.0)
    new_v2 = vsub(vscale(scale, offset), v0)
    s2d = vdot(v1, new_v2)
    s = mix_fma(jnp.ones_like(s2d), s2d, r1)
    denom = -s2d * s2d + 1.0
    t_normed = jnp.sqrt(jnp.maximum(0.0, (-s * s + 1.0))
                        / jnp.where(denom > 0.0, denom, 1.0))
    t_normed = jnp.where(denom > 0.0, t_normed, r1)
    return vadd(vscale(-t_normed * s2d + s, v1), vscale(t_normed, new_v2))


# ===========================================================================
# Arvo spherical triangle fans: ops/sampling_related.py:121-174
# ===========================================================================

class SaArvoSoa:
    def __init__(self, dirs, fan, opposite, active, solid_angle):
        self.dirs = dirs
        self.fan = fan
        self.opposite = opposite  # list of (cos, sin) per tri
        self.active = active
        self.solid_angle = solid_angle


def prepare_sa_arvo_soa(dirs, count, m: int) -> SaArvoSoa:
    v0 = dirs[0]
    fan, opposite, active = [], [], []
    cum = None
    for i in range(m - 2):
        v1 = dirs[i + 1]
        v2 = dirs[i + 2]
        en0 = vnormalize(cross3(vsub(v1, v0), v0))
        en1 = vnormalize(cross3(vsub(v2, v1), v1))
        cos_op = -vdot(en0, en1)
        sin_op = jnp.sqrt(jnp.maximum(0.0, -cos_op * cos_op + 1.0))
        simplex = vdot(v0, cross3(v1, v2))
        tangent = jnp.abs(simplex) / (1.0 + vdot(v0, v1) + vdot(v0, v2)
                                      + vdot(v1, v2))
        sa_i = 2.0 * positive_atan_soa(tangent, False)
        if count is None:
            act = None
        else:
            act = (i + 2) < jnp.maximum(count, 3)
            sa_i = jnp.where(act, sa_i, 0.0)
        opposite.append((cos_op, sin_op))
        active.append(act)
        cum = sa_i if cum is None else cum + sa_i
        fan.append(cum)
    return SaArvoSoa(dirs, fan, opposite, active, cum)


def sample_sa_arvo_soa(poly: SaArvoSoa, r0, r1, m: int):
    """ops/sampling_related.py:147-174 (glsl:262-293)."""
    target = poly.solid_angle * r0
    nt = m - 2
    sel_op = poly.opposite[nt - 1]
    sel_prev = poly.fan[nt - 2] if nt >= 2 else jnp.zeros_like(target)
    sel_v0 = poly.dirs[nt]
    sel_v2 = poly.dirs[nt + 1]
    for i in range(nt - 2, -1, -1):
        reach = poly.fan[i] >= target
        if poly.active[i] is not None:
            reach = reach & poly.active[i]
        sel_op = tuple(jnp.where(reach, a, b)
                       for a, b in zip(poly.opposite[i], sel_op))
        prev = poly.fan[i - 1] if i >= 1 else jnp.zeros_like(target)
        sel_prev = jnp.where(reach, prev, sel_prev)
        sel_v0 = vwh(reach, poly.dirs[i + 1], sel_v0)
        sel_v2 = vwh(reach, poly.dirs[i + 2], sel_v2)
    if poly.active[nt - 1] is not None:
        # Fall back to the last ACTIVE triangle when nothing reaches.
        last_op = poly.opposite[0]
        last_prev = jnp.zeros_like(target)
        last_v0 = poly.dirs[1]
        last_v2 = poly.dirs[2]
        for i in range(1, nt):
            act = poly.active[i]
            last_op = tuple(jnp.where(act, a, b)
                            for a, b in zip(poly.opposite[i], last_op))
            last_prev = jnp.where(act, poly.fan[i - 1], last_prev)
            last_v0 = vwh(act, poly.dirs[i + 1], last_v0)
            last_v2 = vwh(act, poly.dirs[i + 2], last_v2)
        any_reach = None
        for i in range(nt):
            r = poly.fan[i] >= target
            if poly.active[i] is not None:
                r = r & poly.active[i]
            any_reach = r if any_reach is None else (any_reach | r)
        sel_op = tuple(jnp.where(any_reach, a, b)
                       for a, b in zip(sel_op, last_op))
        sel_prev = jnp.where(any_reach, sel_prev, last_prev)
        sel_v0 = vwh(any_reach, sel_v0, last_v0)
        sel_v2 = vwh(any_reach, sel_v2, last_v2)

    tv0 = sel_v0
    tv1 = poly.dirs[0]
    tv2 = sel_v2
    sub = target - sel_prev
    ssa_cos = jnp.cos(sub)
    ssa_sin = jnp.sin(sub)
    cos_op, sin_op = sel_op
    p = ssa_sin * cos_op - ssa_cos * sin_op
    q = ssa_sin * sin_op + ssa_cos * cos_op
    u = q - cos_op
    v = p + sin_op * vdot(tv0, tv1)
    s_div = (v * p + u * q) * sin_op
    s = ((v * q - u * p) * cos_op - v) \
        / jnp.where(s_div != 0.0, s_div, 1.0)
    edge20 = vnormalize(vsub(tv2, vscale(vdot(tv0, tv2), tv0)))
    vertex2 = vadd(vscale(s, tv0),
                   vscale(jnp.sqrt(_clip01(-s * s + 1.0)), edge20))
    z = 1.0 - r1 * (1.0 - vdot(vertex2, tv1))
    edge21 = vnormalize(vsub(vertex2, vscale(vdot(tv1, vertex2), tv1)))
    return vadd(vscale(z, tv1),
                vscale(jnp.sqrt(_clip01(-z * z + 1.0)), edge21))


# ===========================================================================
# Urena spherical rectangles: ops/sampling_related.py:54-106
# ===========================================================================

class UrenaSoa:
    def __init__(self, x_axis, y_axis, z_axis, z0, z0sq, x0, y0, y0sq,
                 x1, y1, y1sq, b0, b1, b0sq, k, solid_angle):
        self.x_axis = x_axis
        self.y_axis = y_axis
        self.z_axis = z_axis
        self.z0 = z0
        self.z0sq = z0sq
        self.x0 = x0
        self.y0 = y0
        self.y0sq = y0sq
        self.x1 = x1
        self.y1 = y1
        self.y1sq = y1sq
        self.b0 = b0
        self.b1 = b1
        self.b0sq = b0sq
        self.k = k
        self.solid_angle = solid_angle


def prepare_urena_soa(s, exl, eyl, axis_x, axis_y, axis_z, o) -> UrenaSoa:
    """s/axes: vec3s of traced SMEM scalars; exl/eyl scalars; o: vec3 of
    planes (shading position)."""
    d = tuple(s[c] - o[c] for c in range(3))
    z0_raw = vdot(d, axis_z)
    neg = z0_raw > 0.0
    z_axis = tuple(wh(neg, -axis_z[c] + jnp.zeros_like(z0_raw),
                      axis_z[c] + jnp.zeros_like(z0_raw)) for c in range(3))
    z0 = -jnp.abs(z0_raw)
    x0 = vdot(d, axis_x)
    y0 = vdot(d, axis_y)
    x1 = x0 + exl
    y1 = y0 + eyl
    v00 = _vec(x0, y0, z0)
    v01 = _vec(x0, y1, z0)
    v10 = _vec(x1, y0, z0)
    v11 = _vec(x1, y1, z0)
    n0 = vnormalize(cross3(v00, v10))
    n1 = vnormalize(cross3(v10, v11))
    n2 = vnormalize(cross3(v11, v01))
    n3 = vnormalize(cross3(v01, v00))
    # acos primitive: no Pallas TPU lowering — use the SoA twin.
    g0 = acos_soa(jnp.clip(-vdot(n0, n1), -1.0, 1.0))
    g1 = acos_soa(jnp.clip(-vdot(n1, n2), -1.0, 1.0))
    g2 = acos_soa(jnp.clip(-vdot(n2, n3), -1.0, 1.0))
    g3 = acos_soa(jnp.clip(-vdot(n3, n0), -1.0, 1.0))
    b0 = n0[2]
    b1 = n2[2]
    k = 2.0 * _PI - g2 - g3
    return UrenaSoa(axis_x, axis_y, z_axis, z0, z0 * z0, x0, y0, y0 * y0,
                    x1, y1, y1 * y1, b0, b1, b0 * b0, k, g0 + g1 - k)


def sample_urena_soa(sq: UrenaSoa, u, v):
    au = u * sq.solid_angle + sq.k
    sin_au = jnp.sin(au)
    fu = (jnp.cos(au) * sq.b0 - sq.b1) \
        / jnp.where(sin_au != 0.0, sin_au, 1.0)
    cu = 1.0 / jnp.sqrt(fu * fu + sq.b0sq)
    cu = jnp.where(fu > 0.0, cu, -cu)
    cu = jnp.clip(cu, -1.0, 1.0)
    xu = -(cu * sq.z0) / jnp.sqrt(jnp.maximum(1.0 - cu * cu, F(1e-20)))
    xu = jnp.clip(xu, sq.x0, sq.x1)
    d = jnp.sqrt(xu * xu + sq.z0sq)
    h0 = sq.y0 / jnp.sqrt(d * d + sq.y0sq)
    h1 = sq.y1 / jnp.sqrt(d * d + sq.y1sq)
    hv = h0 + v * (h1 - h0)
    mhv2_1 = -hv * hv + 1.0
    yv = jnp.where(mhv2_1 >= 0.0,
                   (hv * d) / jnp.sqrt(jnp.maximum(mhv2_1, F(1e-20))),
                   sq.y1)
    out = tuple(xu * (sq.x_axis[c] + jnp.zeros_like(xu))
                + yv * (sq.y_axis[c] + jnp.zeros_like(yv))
                + sq.z0 * sq.z_axis[c] for c in range(3))
    return vnormalize(out)


# ===========================================================================
# Turk uniform area sampling: render/shading.py:906-928
# (polygon_sampling_related_work.glsl:38-64)
# ===========================================================================

def sample_area_turk_soa(verts, fan_tri_areas, fan_cum_areas, nv: int,
                         r0, r1):
    """verts: nv vec3s of SMEM scalars (world space); fan_*: per-fan-
    triangle SMEM scalars ((nv-2) entries, reference padding already
    applied). Returns the sampled WORLD position as a vec3 of planes."""
    nt = nv - 2
    total = fan_cum_areas[nt - 1]
    target = total * r0
    sel_prev = fan_cum_areas[nt - 2] if nt >= 2 else jnp.zeros_like(target)
    sel_area = fan_tri_areas[nt - 1] + jnp.zeros_like(target)
    sel_v0 = tuple(verts[nt][c] + jnp.zeros_like(target) for c in range(3))
    sel_v2 = tuple(verts[nt + 1][c] + jnp.zeros_like(target)
                   for c in range(3))
    for i in range(nt - 2, -1, -1):
        reach = fan_cum_areas[i] >= target
        prev = fan_cum_areas[i - 1] if i >= 1 else jnp.zeros_like(target)
        sel_prev = jnp.where(reach, prev, sel_prev)
        sel_area = jnp.where(reach, fan_tri_areas[i], sel_area)
        sel_v0 = tuple(jnp.where(reach, verts[i + 1][c], sel_v0[c])
                       for c in range(3))
        sel_v2 = tuple(jnp.where(reach, verts[i + 2][c], sel_v2[c])
                       for c in range(3))
    sub = target - sel_prev
    r0t = sub / jnp.where(sel_area != 0.0, sel_area, 1.0)
    sqrt_r0 = jnp.sqrt(jnp.maximum(r0t, 0.0))
    b0 = 1.0 - sqrt_r0
    b1 = sqrt_r0 * r1
    b2 = -sqrt_r0 * r1 + sqrt_r0
    v1 = verts[0]
    return tuple(b0 * sel_v0[c] + b1 * v1[c] + b2 * sel_v2[c]
                 for c in range(3))


# ===========================================================================
# Hart et al. cosine warps: ops/sampling_related.py:181-315
# ===========================================================================

def _last_active_z(dirs, count, m: int):
    """z of the last active vertex (index count - 1, clipped to [2, m-1])."""
    if count is None:
        return dirs[m - 1][2]
    z = dirs[2][2]
    for i in range(3, m):
        z = jnp.where(count - 1 >= i, dirs[i][2], z)
    return z


def _last_active_dir(dirs, count, m: int):
    if count is None:
        return dirs[m - 1]
    v = dirs[2]
    for i in range(3, m):
        v = vwh(count - 1 >= i, dirs[i], v)
    return v


class HartBilinearSoa:
    def __init__(self, poly, density_0, density_1a, density_1b):
        self.poly = poly
        self.density_0 = density_0
        self.density_1a = density_1a
        self.density_1b = density_1b


def prepare_hart_bilinear_soa(dirs, count, m: int,
                              biased: bool = False) -> HartBilinearSoa:
    poly = prepare_sa_soa(dirs, count, m, biased)
    d0 = jnp.maximum(0.0, dirs[0][2])
    d1a = jnp.maximum(0.0, dirs[1][2])
    d1b = jnp.maximum(0.0, _last_active_z(dirs, count, m))
    dsum = 2.0 * d0 + d1a + d1b
    sa = poly.solid_angle
    norm = 4.0 / (sa * dsum)
    inv_sa = 1.0 / sa
    degen = dsum <= 0.0
    return HartBilinearSoa(
        poly,
        jnp.where(degen, inv_sa, d0 * norm),
        jnp.where(degen, inv_sa, d1a * norm),
        jnp.where(degen, inv_sa, d1b * norm))


def linear_warp_soa(r, density_0, density_1):
    lerped_sq = mix_fma(density_0 * density_0, density_1 * density_1, r)
    divisor = density_0 + jnp.sqrt(jnp.maximum(lerped_sq, 0.0))
    return r * (density_0 + density_1) \
        / jnp.where(divisor != 0.0, divisor, 1.0)


def sample_hart_bilinear_soa(w: HartBilinearSoa, r0, r1, m: int):
    """Returns (direction vec3, density)."""
    r1w = linear_warp_soa(r1, 2.0 * w.density_0, w.density_1a + w.density_1b)
    d0 = mix_fma(w.density_0, w.density_1a, r1w)
    d1 = mix_fma(w.density_0, w.density_1b, r1w)
    r0w = linear_warp_soa(r0, d0, d1)
    density = mix_fma(d0, d1, r0w)
    direction = sample_sa_soa(w.poly, r0w, r1w, m)
    return direction, density


class HartBiquadraticSoa:
    def __init__(self, poly, density_0, density_1, density_2):
        self.poly = poly
        self.density_0 = density_0
        self.density_1 = density_1  # 3-tuple
        self.density_2 = density_2  # 3-tuple


def prepare_hart_biquadratic_soa(dirs, count, m: int,
                                 biased: bool = False) -> HartBiquadraticSoa:
    poly = prepare_sa_soa(dirs, count, m, biased)
    v0 = dirs[0]
    last = _last_active_dir(dirs, count, m)
    d0 = jnp.maximum(0.0, v0[2])
    d2_0 = jnp.maximum(0.0, dirs[1][2])
    d2_2 = jnp.maximum(0.0, last[2])
    half = jnp.full_like(d0, 0.5)
    one = jnp.ones_like(d0)
    sample_2_1 = sample_sa_soa(poly, half, one, m)
    d2_1 = jnp.maximum(0.0, sample_2_1[2])

    # Middle row: tail of SA sampling at r1 = 0.5 for the three far dirs
    # (note: column 0 warps toward vertex 0 itself, matching
    # ops/sampling_related.py:258 / glsl:430-443).
    d1 = []
    for far in (v0, sample_2_1, last):
        s2 = vdot(v0, far)
        s = 0.5 * s2 + 0.5
        t = jnp.sqrt(jnp.maximum(0.0, -s * s + 1.0))
        t_axis_z = -s2 * v0[2] + far[2]
        norm_t = 1.0 / jnp.sqrt(jnp.maximum(2.0 * (-s2 * s2 + 1.0),
                                            F(1e-20)))
        d1.append(jnp.maximum(0.0, s * v0[2] + t * norm_t * t_axis_z))

    dsum = 3.0 * d0 + d1[0] + d1[1] + d1[2] + d2_0 + d2_1 + d2_2
    sa = poly.solid_angle
    norm = 9.0 / (sa * dsum)
    inv_sa = 1.0 / sa
    degen = dsum <= 0.0

    def fix(x):
        return jnp.where(degen, inv_sa, x * norm)

    return HartBiquadraticSoa(
        poly, fix(d0),
        (fix(d1[0]), fix(d1[1]), fix(d1[2])),
        (fix(d2_0), fix(d2_1), fix(d2_2)))


def solve_cubic_soa(c0, c1, c2, c3):
    """ops/cubic.py Blinn solver on planes: returns (r0, r1, r2,
    three_real)."""
    n0 = c0 / c3
    n1 = c1 / (3.0 * c3)
    n2 = c2 / (3.0 * c3)
    delta0 = -n2 * n2 + n1
    delta1 = -n1 * n2 + n0
    delta2 = n2 * n0 - n1 * n1
    disc = 4.0 * delta0 * delta2 - delta1 * delta1
    sqrt_abs = jnp.sqrt(jnp.abs(disc))
    dep0 = -2.0 * n2 * delta0 + delta1
    dep1 = delta0
    # atan2 and cbrt primitives have no Pallas TPU lowering (measured on
    # v5e); use the SoA atan2 and an exp/log cube root.
    theta = atan2_soa(sqrt_abs, -dep0) * F(1.0 / 3.0)
    cr_cos = jnp.cos(theta)
    cr_sin = jnp.sin(theta)
    sqrt_075 = F(np.sqrt(0.75))
    scale = 2.0 * jnp.sqrt(jnp.maximum(-dep1, 0.0))
    r0 = cr_cos * scale - n2
    r1 = (-sqrt_075 * cr_sin - 0.5 * cr_cos) * scale - n2
    r2 = (sqrt_075 * cr_sin - 0.5 * cr_cos) * scale - n2
    signed_sqrt = jnp.where(dep0 < 0.0, sqrt_abs, -sqrt_abs)
    quad_root = 0.5 * (signed_sqrt - dep0)
    abs_qr = jnp.abs(quad_root)
    cube0_mag = jnp.exp(jnp.log(jnp.where(abs_qr > 0.0, abs_qr, 1.0))
                        * F(1.0 / 3.0))
    cube0 = jnp.where(abs_qr > 0.0,
                      jnp.where(quad_root < 0.0, -cube0_mag, cube0_mag),
                      0.0)
    cube1 = -dep1 / jnp.where(cube0 != 0.0, cube0, 1.0)
    cube1 = jnp.where(cube0 != 0.0, cube1, 0.0)
    root1 = cube0 + cube1 - n2
    three = disc >= 0.0
    return (jnp.where(three, r0, root1), jnp.where(three, r1, root1),
            jnp.where(three, r2, root1), three)


def quadratic_warp_soa(r, d0, d1, d2):
    q0 = d0
    q1 = 2.0 * (d1 - d0)
    q2 = d0 - 2.0 * d1 + d2
    c1 = q0
    c2 = 0.5 * q1
    c3 = F(1.0 / 3.0) * q2
    scaled = r * (c1 + c2 + c3)
    r0, r1, r2, three = solve_cubic_soa(-scaled, c1, c2, c3)
    out = r0
    out = jnp.where(three & (r1 >= 0.0) & (r1 <= 1.0), r1, out)
    out = jnp.where(three & (r2 >= 0.0) & (r2 <= 1.0), r2, out)
    return out


def quadratic_bezier_soa(b0, b1, b2, x):
    return mix_fma(mix_fma(b0, b1, x), mix_fma(b1, b2, x), x)


def sample_hart_biquadratic_soa(w: HartBiquadraticSoa, r0, r1, m: int):
    r1w = quadratic_warp_soa(
        r1, 3.0 * w.density_0,
        w.density_1[0] + w.density_1[1] + w.density_1[2],
        w.density_2[0] + w.density_2[1] + w.density_2[2])
    d0 = quadratic_bezier_soa(w.density_0, w.density_1[0], w.density_2[0],
                              r1w)
    d1 = quadratic_bezier_soa(w.density_0, w.density_1[1], w.density_2[1],
                              r1w)
    d2 = quadratic_bezier_soa(w.density_0, w.density_1[2], w.density_2[2],
                              r1w)
    r0w = quadratic_warp_soa(r0, d0, d1, d2)
    density = quadratic_bezier_soa(d0, d1, d2, r0w)
    direction = sample_sa_soa(w.poly, r0w, r1w, m)
    return direction, density
