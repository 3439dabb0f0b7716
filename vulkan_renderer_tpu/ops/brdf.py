"""BRDF module: Disney diffuse + Frostbite GGX/Smith/Schlick specular and
GGX visible-normal-distribution sampling.

TPU-native re-implementation of the reference's BRDF kernel library
(src/shaders/brdfs.glsl:21-224). Functions operate on unbatched (3,) /
scalar inputs and are vmapped over pixels by the shading pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .math_utils import M_INV_PI, M_PI, F32, normalize


class ShadingData(NamedTuple):
    """Per-pixel shading inputs (reference: brdfs.glsl shading_data_t)."""
    position: jnp.ndarray       # (..., 3) world-space shading position
    normal: jnp.ndarray         # (..., 3) world-space shading normal
    outgoing: jnp.ndarray       # (..., 3) normalized direction to the eye
    lambert_outgoing: jnp.ndarray  # (...,) dot(normal, outgoing)
    diffuse_albedo: jnp.ndarray    # (..., 3)
    fresnel_0: jnp.ndarray         # (..., 3) specular F0
    roughness: jnp.ndarray         # (...,) GGX alpha (already squared+clamped)


def fresnel_schlick(fresnel_0, fresnel_90, cos_theta):
    flipped = 1.0 - cos_theta
    flipped_sq = flipped * flipped
    return fresnel_0 + (fresnel_90 - fresnel_0) * (flipped_sq * flipped * flipped_sq)


def evaluate_brdf(data: ShadingData, incoming, diffuse: bool = True,
                  specular: bool = True):
    """Disney diffuse + Frostbite specular, times 1/pi (brdfs.glsl:57-88).

    `diffuse`/`specular` are static Python bools (jit specialization), like
    the reference's compile-time bool arguments.
    """
    half_vector = normalize(incoming + data.outgoing)
    lambert_in = jnp.sum(data.normal * incoming, axis=-1)
    out_dot_half = jnp.sum(data.outgoing * half_vector, axis=-1)
    brdf = jnp.zeros_like(data.diffuse_albedo)

    if diffuse:
        fresnel_90 = out_dot_half * out_dot_half * (2.0 * data.roughness) + 0.5
        f_out = fresnel_schlick(F32(1.0), fresnel_90, data.lambert_outgoing)
        f_in = fresnel_schlick(F32(1.0), fresnel_90, lambert_in)
        brdf = brdf + (f_out * f_in)[..., None] * data.diffuse_albedo

    if specular:
        normal_dot_half = jnp.sum(data.normal * half_vector, axis=-1)
        r_sq = data.roughness * data.roughness
        ggx = (normal_dot_half * r_sq - normal_dot_half) * normal_dot_half + 1.0
        ggx = r_sq / (ggx * ggx)
        lo = data.lambert_outgoing
        masking = lambert_in * jnp.sqrt((-lo * r_sq + lo) * lo + r_sq)
        shadowing = lo * jnp.sqrt((-lambert_in * r_sq + lambert_in) * lambert_in + r_sq)
        smith = 0.5 / (masking + shadowing)
        fresnel = fresnel_schlick(data.fresnel_0, F32(1.0),
                                  jnp.clip(out_dot_half, 0.0, 1.0)[..., None])
        brdf = brdf + (ggx * smith)[..., None] * fresnel

    return brdf * F32(M_INV_PI)


def sample_ggx_visible_normal(outgoing_shading_space, roughness_xy,
                              random_numbers):
    """Sample the GGX visible-normal distribution (brdfs.glsl:122-162).

    Heitz/Walter construction: inputs and outputs are in shading space
    (z = surface normal). roughness_xy is (2,).
    """
    out = outgoing_shading_space
    axis_z = normalize(jnp.stack([roughness_xy[..., 0] * out[..., 0],
                                  roughness_xy[..., 1] * out[..., 1],
                                  out[..., 2]], axis=-1))
    length_sq = axis_z[..., 0] ** 2 + axis_z[..., 1] ** 2
    inv_len = jnp.where(length_sq > 0.0, 1.0 / jnp.sqrt(jnp.maximum(length_sq, 1e-37)), 0.0)
    axis_x = jnp.stack([-axis_z[..., 1] * inv_len,
                        axis_z[..., 0] * inv_len,
                        jnp.zeros_like(inv_len)], axis=-1)
    axis_x = jnp.where((length_sq <= 0.0)[..., None],
                       jnp.array([1.0, 0.0, 0.0], F32), axis_x)
    axis_y = jnp.cross(axis_z, axis_x)

    radius = jnp.sqrt(random_numbers[..., 0])
    azimuth = (2.0 * M_PI) * random_numbers[..., 1]
    disk_x = radius * jnp.cos(azimuth)
    disk_y = radius * jnp.sin(azimuth)
    lerp_factor = 0.5 * axis_z[..., 2] + 0.5
    y = (1.0 - lerp_factor) * jnp.sqrt(jnp.maximum(0.0, 1.0 - disk_x * disk_x)) \
        + lerp_factor * disk_y
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - disk_x * disk_x - y * y))
    sample_hemi = (disk_x[..., None] * axis_x + y[..., None] * axis_y
                   + z[..., None] * axis_z)
    result = jnp.stack([roughness_xy[..., 0] * sample_hemi[..., 0],
                        roughness_xy[..., 1] * sample_hemi[..., 1],
                        sample_hemi[..., 2]], axis=-1)
    return normalize(result)


def ggx_visible_normal_density(outgoing_dot_normal, microfacet_dot_normal,
                               microfacet_dot_outgoing, roughness):
    """Density of sample_ggx_visible_normal (brdfs.glsl:180-191)."""
    r_sq = roughness * roughness
    m = microfacet_dot_normal
    ggx = (m * r_sq - m) * m + 1.0
    ggx = r_sq / (ggx * ggx) * F32(M_INV_PI)
    o = outgoing_dot_normal
    masking_over_out_z = jnp.sqrt((-o * r_sq + o) * o + r_sq)
    masking_over_out_z = 2.0 / (o + masking_over_out_z)
    return masking_over_out_z * microfacet_dot_outgoing * ggx


def sample_ggx_reflected_direction(outgoing_shading_space, roughness,
                                   random_numbers):
    """Sample approx. proportional to the GGX specular BRDF
    (brdfs.glsl:200-213). Returns (direction, density)."""
    roughness_xy = jnp.stack([roughness, roughness], axis=-1)
    micro_normal = sample_ggx_visible_normal(outgoing_shading_space,
                                             roughness_xy, random_numbers)
    micro_dot_out = jnp.sum(micro_normal * outgoing_shading_space, axis=-1)
    density = ggx_visible_normal_density(outgoing_shading_space[..., 2],
                                         micro_normal[..., 2],
                                         micro_dot_out, roughness)
    incoming = (2.0 * micro_dot_out)[..., None] * micro_normal - outgoing_shading_space
    density = density / (4.0 * micro_dot_out)
    return incoming, density


def ggx_reflected_direction_density(outgoing_dot_normal, outgoing_dir,
                                    incoming_dir, surface_normal, roughness):
    """Density of sample_ggx_reflected_direction (brdfs.glsl:218-224)."""
    micro_normal = normalize(outgoing_dir + incoming_dir)
    micro_dot_out = jnp.sum(micro_normal * outgoing_dir, axis=-1)
    micro_dot_normal = jnp.sum(micro_normal * surface_normal, axis=-1)
    density = ggx_visible_normal_density(outgoing_dot_normal, micro_dot_normal,
                                         micro_dot_out, roughness)
    return density / (4.0 * micro_dot_out)
