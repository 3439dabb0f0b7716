"""Linear (line segment) light sampling — the HPG 2021 companion paper's
capability ("BRDF Importance Sampling for Linear Lights"; the reference
keeps it on a separate branch with line_sampling.glsl).

Model: a thin cylinder of radius r -> 0 collapses to a segment [A, B].
With Lambertian surface radiance L, the differential contribution of line
point P(t) to shading point x is

    dE = f_r(omega) * cos(theta_x) * L_eff * sin(alpha) / d^2 * len dt

where omega = (P(t) - x)/d, alpha is the angle between the line direction
and omega (the cylinder's apparent-width factor), and L_eff = 2 r L (the
"linear radiance"). A light of total radiant flux Phi has
L_eff = Phi / (pi^2 * len).

Techniques (importance targets, mirroring the paper's ladder):
- uniform:   t ~ U[0,1]                                  (baseline)
- distance:  t ~ 1/d^2, exact inverse CDF via the classic
             perpendicular-foot atan parametrization      (solid-angle-ish)
- projected / LTC: target adds cos(theta_x) (diffuse) or the LTC density
             (specular); sampled by resampled importance sampling (RIS)
             over `ris_candidates` distance-sampled candidates — unbiased
             for any candidate count, with variance decreasing in K.

All functions are unbatched + vmap-friendly like ops/sampling.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .math_utils import F32, M_PI, normalize, pick_lane


class LineSampling(NamedTuple):
    """Per-(shading point, segment) intermediates."""
    start: jnp.ndarray        # (3,) segment start A
    axis: jnp.ndarray         # (3,) unit direction (B - A)/len
    length: jnp.ndarray       # ()
    foot_s: jnp.ndarray       # () arc parameter of perpendicular foot
    perp: jnp.ndarray         # (3,) x -> line perpendicular offset
    h: jnp.ndarray            # () perpendicular distance (>= eps)
    theta0: jnp.ndarray       # () atan((0 - foot_s)/h)
    theta1: jnp.ndarray       # () atan((len - foot_s)/h)
    norm_1_d2: jnp.ndarray    # () integral of 1/d^2 dl = (theta1-theta0)/h


def prepare_line_sampling(a, b, shading_position) -> LineSampling:
    delta = b - a
    length = jnp.linalg.norm(delta)
    axis = delta / jnp.maximum(length, 1e-20)
    to_a = a - shading_position
    foot_s = -jnp.sum(to_a * axis)
    perp = to_a + foot_s * axis  # from x to the line at the foot, negated:
    perp = -perp                 # x + perp == foot point? keep as offset
    h = jnp.maximum(jnp.linalg.norm(perp), 1e-6)
    theta0 = jnp.arctan2(0.0 - foot_s, h)
    theta1 = jnp.arctan2(length - foot_s, h)
    return LineSampling(
        start=a, axis=axis, length=length, foot_s=foot_s, perp=perp, h=h,
        theta0=theta0, theta1=theta1,
        norm_1_d2=(theta1 - theta0) / h)


def line_point(prep: LineSampling, t):
    return prep.start + (t * prep.length)[..., None] * prep.axis


def line_geometry(prep: LineSampling, t, shading_position):
    """(omega (3,), dist, sin_alpha) toward parameter t in [0, 1]."""
    p = line_point(prep, t)
    offset = p - shading_position
    dist = jnp.maximum(jnp.linalg.norm(offset), 1e-8)
    omega = offset / dist
    cos_alpha = jnp.clip(jnp.sum(omega * prep.axis), -1.0, 1.0)
    sin_alpha = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_alpha * cos_alpha))
    return omega, dist, sin_alpha


def sample_line_uniform(prep: LineSampling, u):
    """t ~ U[0,1]; density per unit length = 1/len."""
    return u, 1.0 / jnp.maximum(prep.length, 1e-20)


def sample_line_distance(prep: LineSampling, u):
    """t ~ 1/d^2 (exact): s = foot + h * tan(lerp(theta0, theta1, u)).

    Returns (t in [0,1], density per unit LENGTH)."""
    theta = prep.theta0 + u * (prep.theta1 - prep.theta0)
    s = prep.foot_s + prep.h * jnp.tan(theta)
    t = jnp.clip(s / jnp.maximum(prep.length, 1e-20), 0.0, 1.0)
    d_sq = prep.h * prep.h + (s - prep.foot_s) ** 2
    density = 1.0 / (d_sq * prep.norm_1_d2)
    return t, density


def sample_line_ris(prep: LineSampling, shading_position, target_fn,
                    random_numbers, ris_candidates: int = 4):
    """Resampled importance sampling toward an arbitrary target.

    target_fn(t, omega, dist, sin_alpha) -> scalar >= 0 (unnormalized).
    random_numbers: (ris_candidates + 1, 2)... uses [i, 0] for candidates
    and [-1, 1] for selection. Returns (t, omega, dist, sin_alpha,
    ris_weight) where the unbiased estimator is
        f(t) / target(t) * ris_weight
    with ris_weight = mean_i(target_i / source_i).
    """
    ts, weights, targets = [], [], []
    geo = []
    for i in range(ris_candidates):
        t_i, src_density = sample_line_distance(prep, random_numbers[i, 0])
        omega, dist, sin_alpha = line_geometry(prep, t_i, shading_position)
        tgt = target_fn(t_i, omega, dist, sin_alpha)
        w = tgt / jnp.maximum(src_density, 1e-20)
        ts.append(t_i)
        weights.append(w)
        targets.append(tgt)
        geo.append((omega, dist, sin_alpha))
    w_arr = jnp.stack(weights)
    cum = jnp.cumsum(w_arr)
    total = cum[-1]
    pick = random_numbers[-1, 1] * total
    sel = jnp.argmax(pick < cum)
    sel = jnp.where(total > 0.0, sel, 0)
    t = pick_lane(jnp.stack(ts), sel)
    omega = pick_lane(jnp.stack([g[0] for g in geo]), sel)
    dist = pick_lane(jnp.stack([g[1] for g in geo]), sel)
    sin_alpha = pick_lane(jnp.stack([g[2] for g in geo]), sel)
    target_sel = pick_lane(jnp.stack(targets), sel)
    ris_weight = total / ris_candidates
    # Estimator: f / target * ris_weight; guard degenerate totals.
    inv_target = jnp.where(target_sel > 0.0,
                           1.0 / jnp.maximum(target_sel, 1e-30), 0.0)
    return t, omega, dist, sin_alpha, ris_weight * inv_target


def line_flux_to_linear_radiance(radiant_flux, length):
    """L_eff = Phi / (pi^2 * len): a Lambertian thin cylinder of total flux
    Phi emits intensity-per-length L_eff * sin(alpha)."""
    return radiant_flux / (M_PI * M_PI * jnp.maximum(length, 1e-20))
