"""Golden-image RMSE and variance-ordering tests (BASELINE configs 1-3).

The reference produces its quality ground truths in-renderer at high
sample counts (experiment_list.c:96-100: the 128 spp references rendered
by the same binary). Reference-written frames are not available in this
environment (the lavapipe config-1 frames are part of the data download),
so these tests use the same in-renderer protocol: per-pixel RMSE against a
high-spp self-reference in LINEAR RGB, plus the paper's variance ordering
of sampling techniques (SIGGRAPH 2021 Fig. 13: area sampling > solid
angle > clipped solid angle > projected solid angle for diffuse-only).
"""

import dataclasses
import tempfile

import numpy as np
import pytest

from vulkan_renderer_tpu.assets.noise import NoiseType
from vulkan_renderer_tpu.core.settings import (PolygonSamplingTechnique as
                                               Tech, RenderSettings,
                                               SamplingStrategy as Strat)
from vulkan_renderer_tpu.render.pipeline import render_frame
from vulkan_renderer_tpu.render.shading import SceneStatic
from vulkan_renderer_tpu.scene.camera import FirstPersonCamera
from vulkan_renderer_tpu.scene.lights import PolygonalLightSpec
from vulkan_renderer_tpu.scene.scene import load_scene
from vulkan_renderer_tpu.tools.export_scene import write_test_scene

RES = 96


@pytest.fixture(scope="module")
def cornell():
    d = tempfile.mkdtemp(prefix="golden_")
    vks = write_test_scene(d, "cornell_box", texture_resolution=16)
    light = PolygonalLightSpec(
        translation=np.array([1.0, 1.0, 1.99], np.float32),
        rotation_angles=np.array([np.pi, 0, 0], np.float32),
        scaling_x=0.45, scaling_y=0.45,
        radiant_flux=np.array([40.0, 35.0, 30.0], np.float32))
    scene = load_scene(vks, d + "/cornell_box_textures", [light],
                       noise_type=NoiseType.WHITE)
    static = SceneStatic(light_count=1, light_texturing=(0,),
                         light_vertex_counts=(4,))
    camera = FirstPersonCamera(
        position_world_space=np.array([1.0, 0.15, 1.0], np.float32),
        rotation_x=np.pi / 2, rotation_z=np.pi)
    return scene, static, camera


def _settings(tech, spp, strategy=Strat.DIFFUSE_ONLY, shadows=False):
    return RenderSettings(
        sampling_strategy=strategy, polygon_sampling_technique=tech,
        sample_count=spp, trace_shadow_rays=shadows,
        show_polygonal_lights=False, output_linear_rgb=True,
        animate_noise=False)


def _render(cornell_fixture, settings, seed=0):
    scene, static, camera = cornell_fixture
    rnd = (np.uint32(seed) * np.uint32(0x9E3779B9)
           + np.arange(4, dtype=np.uint32) * np.uint32(0x123456))
    return np.asarray(render_frame(scene, static, camera, settings,
                                   RES, RES, noise_random_numbers=rnd))


def _rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


@pytest.mark.slow
def test_psa_low_spp_matches_high_spp_reference(cornell):
    """Config-2 analogue. The diffuse part of the PSA estimator is exactly
    zero-variance for constant radiance, but diffuse_only evaluates the
    FULL BRDF at the sampled directions (shading_pass.frag.glsl
    sample_polygon_diffuse) and Schlick Fresnel -> 1 at grazing regardless
    of the F0=0.02 floor — so the residual 1-spp noise is the specular
    term. Budgets are calibrated to measurement (rmse@1 0.028, @8 0.009;
    area sampling: 0.194 at 1 spp). Per-pixel RMSE < 1e-3 against
    ANALYTIC float64 ground truths is covered at the estimator level in
    tests/test_sampling.py (irradiance == radiance x PSA)."""
    ref = _render(cornell, _settings(Tech.PROJECTED_SOLID_ANGLE, 64))
    one = _render(cornell, _settings(Tech.PROJECTED_SOLID_ANGLE, 1))
    eight = _render(cornell, _settings(Tech.PROJECTED_SOLID_ANGLE, 8))
    area_one = _render(cornell, _settings(Tech.AREA_TURK, 1))
    assert np.isfinite(ref).all() and np.isfinite(one).all()
    r1, r8 = _rmse(one, ref), _rmse(eight, ref)
    assert r1 < 0.04, r1
    assert r8 < 0.015, r8
    assert r8 < r1 * 0.55, (r1, r8)  # ~1/sqrt(n) convergence
    # The near-zero diffuse variance shows as a large cross-technique gap.
    assert r1 < 0.25 * _rmse(area_one, ref), (r1, _rmse(area_one, ref))


@pytest.mark.slow
def test_techniques_converge_to_psa_reference(cornell):
    """Unbiased techniques must converge to the PSA high-spp ground truth:
    RMSE shrinks at the MC rate and ends below a per-pixel budget
    (measured: area 0.194/0.073/0.027 at 1/8/64 spp; solid angle
    0.130/0.046/0.018; clipped 0.073/0.027/0.011)."""
    ref = _render(cornell, _settings(Tech.PROJECTED_SOLID_ANGLE, 64))
    for tech, budget in ((Tech.AREA_TURK, 0.035),
                         (Tech.SOLID_ANGLE, 0.025),
                         (Tech.CLIPPED_SOLID_ANGLE, 0.016)):
        r1 = _rmse(_render(cornell, _settings(tech, 1)), ref)
        r8 = _rmse(_render(cornell, _settings(tech, 8)), ref)
        r64 = _rmse(_render(cornell, _settings(tech, 64)), ref)
        assert r8 < r1 * 0.55, (tech, r1, r8)
        assert r64 < r8 * 0.55, (tech, r8, r64)
        assert r64 < budget, (tech, r64)


@pytest.mark.slow
def test_variance_ordering_matches_paper(cornell):
    """SIGGRAPH 2021 technique ranking (diffuse, no shadows): mean
    per-pixel variance must order area > solid angle >= clipped solid
    angle > projected solid angle (the last ~zero)."""
    seeds = range(6)
    variances = {}
    for tech in (Tech.AREA_TURK, Tech.SOLID_ANGLE, Tech.CLIPPED_SOLID_ANGLE,
                 Tech.PROJECTED_SOLID_ANGLE):
        frames = np.stack([
            _render(cornell, _settings(tech, 1), seed=s) for s in seeds])
        variances[tech] = float(np.mean(np.var(frames, axis=0)))
    assert variances[Tech.AREA_TURK] \
        > variances[Tech.SOLID_ANGLE] \
        > variances[Tech.PROJECTED_SOLID_ANGLE], variances
    assert variances[Tech.CLIPPED_SOLID_ANGLE] \
        <= variances[Tech.SOLID_ANGLE] * 1.05, variances
    assert variances[Tech.PROJECTED_SOLID_ANGLE] \
        < variances[Tech.AREA_TURK] * 0.05, variances


@pytest.mark.slow
def test_full_mis_with_shadows_self_consistency(cornell):
    """Config-3 analogue at test scale: full MIS + LTC + shadow rays, low
    spp against the high-spp self reference of the SAME estimator."""
    ref = _render(cornell, _settings(
        Tech.PROJECTED_SOLID_ANGLE, 64, strategy=Strat.DIFFUSE_SPECULAR_MIS,
        shadows=True))
    lo = _render(cornell, _settings(
        Tech.PROJECTED_SOLID_ANGLE, 8, strategy=Strat.DIFFUSE_SPECULAR_MIS,
        shadows=True))
    assert np.isfinite(ref).all() and np.isfinite(lo).all()
    # Specular MIS at 8 spp has real variance (measured rmse 0.028); the
    # budget is looser but still per-pixel (a mean-preserving wrong
    # estimator fails it).
    assert _rmse(lo, ref) < 4e-2, _rmse(lo, ref)
