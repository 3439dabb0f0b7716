"""linear <-> sRGB conversion (reference: src/shaders/srgb_utility.glsl:20-53)."""

from __future__ import annotations

import jax.numpy as jnp


def linear_to_srgb(linear):
    linear = jnp.clip(linear, 0.0, 1.0)
    return jnp.where(
        linear <= 0.0031308,
        12.92 * linear,
        1.055 * jnp.power(jnp.maximum(linear, 1e-12), 1.0 / 2.4) - 0.055,
    )


def srgb_to_linear(srgb):
    srgb = jnp.clip(srgb, 0.0, 1.0)
    return jnp.where(
        srgb <= 0.04045,
        (1.0 / 12.92) * srgb,
        jnp.power((srgb + 0.055) * (1.0 / 1.055), 2.4),
    )
