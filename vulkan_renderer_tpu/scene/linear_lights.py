"""Linear (segment) lights: the HPG 2021 companion capability.

The reference keeps linear lights on a separate branch (line_sampling.glsl
+ a linear_lights array in the constant buffer); here they are first-class
scene objects alongside polygonal lights.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np


@dataclasses.dataclass
class LinearLightSpec:
    start: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([-1.0, 0.0, 2.0], np.float32))
    end: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0.0, 2.0], np.float32))
    radiant_flux: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(3, np.float32))


class LinearLights(NamedTuple):
    """Stacked device arrays (leading light axis; may be empty)."""
    start: np.ndarray          # (L, 3)
    end: np.ndarray            # (L, 3)
    linear_radiance: np.ndarray  # (L, 3) = flux / (pi^2 * len)


def stack_linear_lights(specs: list[LinearLightSpec]) -> LinearLights:
    import jax.numpy as jnp

    from ..ops.line_sampling import line_flux_to_linear_radiance
    if not specs:
        return LinearLights(jnp.zeros((0, 3)), jnp.zeros((0, 3)),
                            jnp.zeros((0, 3)))
    start = np.stack([np.asarray(s.start, np.float32) for s in specs])
    end = np.stack([np.asarray(s.end, np.float32) for s in specs])
    lengths = np.linalg.norm(end - start, axis=-1)
    radiance = np.stack([
        np.asarray(line_flux_to_linear_radiance(
            np.asarray(s.radiant_flux, np.float32), lengths[i]))
        for i, s in enumerate(specs)])
    return LinearLights(jnp.asarray(start), jnp.asarray(end),
                        jnp.asarray(radiance))
