"""Shading for linear lights (deferred shadows, like the polygon path).

The estimator layering mirrors the polygon shading pass: a diffuse-target
technique for the cosine-weighted line integral and an LTC-target specular
technique, both unbiased; shadow visibility stays affine so rays join the
frame's wavefront megabatch.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.settings import RenderSettings, SamplingStrategy
from ..ops.brdf import ShadingData, evaluate_brdf
from ..ops.line_sampling import (LineSampling, line_geometry,
                                 prepare_line_sampling, sample_line_distance,
                                 sample_line_ris, sample_line_uniform)
from ..ops.ltc import LtcCoefficients, evaluate_ltc_density
from ..ops.math_utils import F32

RIS_CANDIDATES = 4


def linear_pairs_per_sample(settings: RenderSettings) -> int:
    """Noise pairs consumed per sample per linear light."""
    per_ray = RIS_CANDIDATES + 1 \
        if settings.linear_technique == "projected_ris" else 1
    rays = linear_rays_per_sample(settings)
    return per_ray * rays


def linear_rays_per_sample(settings: RenderSettings) -> int:
    return 1 if settings.sampling_strategy == SamplingStrategy.DIFFUSE_ONLY \
        else 2


def linear_pairs_per_light(settings: RenderSettings) -> int:
    return settings.sample_count * linear_pairs_per_sample(settings)


def linear_rays_per_light(settings: RenderSettings) -> int:
    return settings.sample_count * linear_rays_per_sample(settings)


def evaluate_linear_light_shading(scene, settings: RenderSettings,
                                  light_index: int, data: ShadingData,
                                  ltc: LtcCoefficients, noise_pairs):
    """Returns (base (3,), b (S,3), ray_dirs (S,3), t_max (S,)) like the
    polygon path; S = linear_rays_per_light(settings)."""
    lights = scene.linear_lights
    a = lights.start[light_index]
    c = lights.end[light_index]
    radiance = lights.linear_radiance[light_index]
    prep = prepare_line_sampling(a, c, data.position)
    n = settings.sample_count
    per_ray_pairs = RIS_CANDIDATES + 1 \
        if settings.linear_technique == "projected_ris" else 1
    combined = settings.sampling_strategy != SamplingStrategy.DIFFUSE_ONLY

    def diffuse_target(t, omega, dist, sin_alpha):
        return jnp.maximum(jnp.sum(data.normal * omega), 0.0) \
            * sin_alpha / (dist * dist)

    def specular_target(t, omega, dist, sin_alpha):
        w2s = ltc.world_to_shading_space[:, :3]
        omega_shading = w2s @ omega
        density = evaluate_ltc_density(ltc, omega_shading, F32(1.0))
        return jnp.maximum(density, 0.0) * sin_alpha / (dist * dist)

    def one_estimate(pairs, target_fn, diffuse: bool, specular: bool):
        """pairs: (per_ray_pairs, 2). Returns (b (3,), dir, t_max)."""
        if settings.linear_technique == "uniform":
            t, dens = sample_line_uniform(prep, pairs[0, 0])
            omega, dist, sin_alpha = line_geometry(prep, t, data.position)
            contrib_factor = 1.0 / jnp.maximum(dens, 1e-20)
        elif settings.linear_technique == "distance":
            t, dens = sample_line_distance(prep, pairs[0, 0])
            omega, dist, sin_alpha = line_geometry(prep, t, data.position)
            contrib_factor = 1.0 / jnp.maximum(dens, 1e-20)
        else:  # projected_ris: contrib_factor = ris_weight / target
            t, omega, dist, sin_alpha, contrib_factor = sample_line_ris(
                prep, data.position, target_fn, pairs, RIS_CANDIDATES)
        cos_x = jnp.sum(data.normal * omega)
        brdf = evaluate_brdf(data, omega, diffuse, specular)
        # f = brdf * cos * L_eff * sin_alpha / d^2; estimator = f/p
        # (for RIS, f * ris_weight / target).
        f = brdf * radiance * jnp.maximum(cos_x, 0.0) \
            * sin_alpha / (dist * dist)
        b = f * contrib_factor
        gate = (cos_x > 0.0) & (prep.length > 0.0)
        return (jnp.where(gate, b, 0.0), omega,
                jnp.where(gate, dist * 0.999, 0.0))

    b_all, d_all, t_all = [], [], []
    cursor = 0
    for s in range(n):
        pairs_d = noise_pairs[cursor:cursor + per_ray_pairs]
        cursor += per_ray_pairs
        b, d, t = one_estimate(pairs_d, diffuse_target,
                               True, not combined)
        b_all.append(b)
        d_all.append(d)
        t_all.append(t)
        if combined:
            pairs_s = noise_pairs[cursor:cursor + per_ray_pairs]
            cursor += per_ray_pairs
            b2, d2, t2 = one_estimate(pairs_s, specular_target, False, True)
            b_all.append(b2)
            d_all.append(d2)
            t_all.append(t2)
    scale = F32(1.0 / n)
    return (jnp.zeros(3), jnp.stack(b_all) * scale, jnp.stack(d_all),
            jnp.stack(t_all))
