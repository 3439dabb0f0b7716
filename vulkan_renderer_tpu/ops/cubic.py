"""Blinn's numerically stable cubic solver.

Reference: src/shaders/cubic_solver.glsl:29-76 (Blinn 2007, "How to solve a
cubic equation, part 5"). Branchless jnp version: both the three-real-root
and one-real-root paths are evaluated and selected, so it vmaps cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math_utils import F32


def solve_cubic(coeffs):
    """coeffs: (..., 4) with polynomial c0 + c1 x + c2 x^2 + c3 x^3.

    Returns (roots (..., 3), three_real (...,) bool). When three_real is
    False only roots[..., 0] is meaningful.
    """
    c3 = coeffs[..., 3]
    c0 = coeffs[..., 0] / c3
    c1 = coeffs[..., 1] / (3.0 * c3)
    c2 = coeffs[..., 2] / (3.0 * c3)

    delta0 = -c2 * c2 + c1
    delta1 = -c1 * c2 + c0
    delta2 = c2 * c0 - c1 * c1
    discriminant = 4.0 * delta0 * delta2 - delta1 * delta1
    sqrt_abs_disc = jnp.sqrt(jnp.abs(discriminant))
    depressed0 = -2.0 * c2 * delta0 + delta1
    depressed1 = delta0

    # --- three real roots ---------------------------------------------------
    theta = jnp.arctan2(sqrt_abs_disc, -depressed0) * (1.0 / 3.0)
    cr_cos = jnp.cos(theta)
    cr_sin = jnp.sin(theta)
    sqrt_075 = jnp.sqrt(F32(0.75))
    r0 = cr_cos
    r1 = -sqrt_075 * cr_sin - 0.5 * cr_cos
    r2 = sqrt_075 * cr_sin - 0.5 * cr_cos
    scale = 2.0 * jnp.sqrt(jnp.maximum(-depressed1, 0.0))
    roots3 = jnp.stack([r0, r1, r2], axis=-1) * scale[..., None] - c2[..., None]

    # --- one real root -------------------------------------------------------
    signed_sqrt = jnp.where(depressed0 < 0.0, sqrt_abs_disc, -sqrt_abs_disc)
    quadratic_root = 0.5 * (signed_sqrt - depressed0)
    cube0 = jnp.cbrt(quadratic_root)
    cube1 = -depressed1 / jnp.where(cube0 != 0.0, cube0, 1.0)
    cube1 = jnp.where(cube0 != 0.0, cube1, 0.0)
    root1 = cube0 + cube1 - c2
    roots1 = jnp.stack([root1, root1, root1], axis=-1)

    three_real = discriminant >= 0.0
    roots = jnp.where(three_real[..., None], roots3, roots1)
    return roots, three_real
