"""Render settings — the jit-specialization axis.

The reference turns every setting into one of 39 shader #defines and
recompiles (main.c:724-801). Here RenderSettings is a frozen, hashable
dataclass passed as a static argument to the jitted frame function: each
distinct value triggers one XLA retrace, exactly mirroring the reference's
specialization model.

Enums mirror main.h:45-118 and polygonal_light.h:30-69.
"""

from __future__ import annotations

import dataclasses
import enum


class SamplingStrategy(enum.Enum):
    """main.h:45-67."""
    DIFFUSE_ONLY = "diffuse_only"
    DIFFUSE_GGX_MIS = "diffuse_ggx_mis"
    DIFFUSE_SPECULAR_SEPARATELY = "diffuse_specular_separately"
    DIFFUSE_SPECULAR_MIS = "diffuse_specular_mis"
    DIFFUSE_SPECULAR_RANDOM = "diffuse_specular_random"


class MisHeuristic(enum.Enum):
    """main.h:71-89."""
    BALANCE = "balance"
    POWER = "power"
    WEIGHTED = "weighted"
    OPTIMAL_CLAMPED = "optimal_clamped"
    OPTIMAL = "optimal"


class PolygonSamplingTechnique(enum.Enum):
    """polygonal_light.h:30-69 — all 13 techniques of the paper."""
    BASELINE = "baseline"
    AREA_TURK = "area_turk"
    RECTANGLE_SOLID_ANGLE_URENA = "rectangle_solid_angle_urena"
    SOLID_ANGLE_ARVO = "solid_angle_arvo"
    SOLID_ANGLE = "solid_angle"
    CLIPPED_SOLID_ANGLE = "clipped_solid_angle"
    BILINEAR_COSINE_WARP_HART = "bilinear_cosine_warp_hart"
    BILINEAR_COSINE_WARP_CLIPPING_HART = "bilinear_cosine_warp_clipping_hart"
    BIQUADRATIC_COSINE_WARP_HART = "biquadratic_cosine_warp_hart"
    BIQUADRATIC_COSINE_WARP_CLIPPING_HART = \
        "biquadratic_cosine_warp_clipping_hart"
    PROJECTED_SOLID_ANGLE_ARVO = "projected_solid_angle_arvo"
    PROJECTED_SOLID_ANGLE = "projected_solid_angle"
    PROJECTED_SOLID_ANGLE_BIASED = "projected_solid_angle_biased"


class ErrorDisplay(enum.Enum):
    """main.h:93-118."""
    NONE = "none"
    DIFFUSE_BACKWARD = "diffuse_backward"
    DIFFUSE_BACKWARD_SCALED = "diffuse_backward_scaled"
    DIFFUSE_FORWARD = "diffuse_forward"
    SPECULAR_BACKWARD = "specular_backward"
    SPECULAR_BACKWARD_SCALED = "specular_backward_scaled"
    SPECULAR_FORWARD = "specular_forward"


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """render_settings_t (main.h:127-159); defaults match main.c:232-249."""
    exposure_factor: float = 1.0
    roughness_factor: float = 1.0
    sample_count: int = 1
    sampling_strategy: SamplingStrategy = \
        SamplingStrategy.DIFFUSE_SPECULAR_MIS
    mis_heuristic: MisHeuristic = MisHeuristic.OPTIMAL_CLAMPED
    mis_visibility_estimate: float = 0.5
    polygon_sampling_technique: PolygonSamplingTechnique = \
        PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE
    error_display: ErrorDisplay = ErrorDisplay.NONE
    error_min_exponent: float = -7.0
    noise_type: str = "ahmed_2d"
    animate_noise: bool = True
    trace_shadow_rays: bool = False
    show_polygonal_lights: bool = True
    # Output conversion (reference: OUTPUT_LINEAR_RGB define).
    output_linear_rgb: bool = False
    # frame_bits for 2-frame HDR capture: 0 = color, 1 = low, 2 = high.
    frame_bits: int = 0
    # Linear (segment) light sampling technique (HPG 2021 companion):
    # uniform | distance | projected_ris.
    linear_technique: str = "projected_ris"
