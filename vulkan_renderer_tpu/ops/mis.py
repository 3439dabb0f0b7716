"""Multiple importance sampling heuristics.

Reference: src/shaders/shading_pass.frag.glsl:243-293. The heuristic is a
static (jit-specialized) choice, mirroring the reference's #define dispatch.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class MisHeuristic(enum.Enum):
    BALANCE = "balance"
    POWER = "power"
    WEIGHTED = "weighted"
    OPTIMAL_CLAMPED = "optimal_clamped"
    OPTIMAL = "optimal"


def mis_weight_over_density(heuristic: MisHeuristic, sampled_density,
                            other_density):
    """Balance/power MIS weight divided by sampled density
    (shading_pass.frag.glsl:243-252)."""
    if heuristic == MisHeuristic.BALANCE:
        return 1.0 / (sampled_density + other_density)
    if heuristic == MisHeuristic.POWER:
        return sampled_density / (sampled_density * sampled_density
                                  + other_density * other_density)
    raise ValueError(f"use mis_estimate for {heuristic}")


def mis_estimate(heuristic: MisHeuristic, visibility, integrand,
                 sampled_weight, sampled_density, other_weight, other_density,
                 visibility_estimate):
    """Full MIS estimator (shading_pass.frag.glsl:270-293).

    `visibility` is a bool array; `integrand` already includes visibility
    (it is zero for occluded samples), matching the reference call sites.
    """
    if heuristic == MisHeuristic.WEIGHTED:
        weighted_sum = sampled_weight * sampled_density + other_weight * other_density
        return (sampled_weight * integrand) / weighted_sum

    if heuristic in (MisHeuristic.OPTIMAL_CLAMPED, MisHeuristic.OPTIMAL):
        balance = 1.0 / (sampled_density + other_density)
        weighted_sum = sampled_weight * sampled_density + other_weight * other_density
        if heuristic == MisHeuristic.OPTIMAL_CLAMPED:
            weighted_wod = sampled_weight / weighted_sum
            mixed = -visibility_estimate * balance + balance
            mixed = visibility_estimate * weighted_wod + mixed
            return mixed * integrand
        # OPTIMAL: unbiased, possibly negative.
        return visibility_estimate * sampled_weight \
            + balance * (integrand - visibility_estimate * weighted_sum)

    wod = mis_weight_over_density(heuristic, sampled_density, other_density)
    return wod * integrand
