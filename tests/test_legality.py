"""Settings legality validation (reference GUI masking rules,
user_interface.cpp:88-199, VERDICT r1 item 10)."""

import pytest

from vulkan_renderer_tpu.core.settings import (ErrorDisplay, MisHeuristic,
                                               PolygonSamplingTechnique as T,
                                               RenderSettings,
                                               SamplingStrategy as S,
                                               legalize_settings,
                                               settings_violations)


def test_default_settings_legal():
    RenderSettings()  # must not raise


def test_specular_strategy_requires_psa():
    with pytest.raises(ValueError, match="specular sampling strategy"):
        RenderSettings(sampling_strategy=S.DIFFUSE_SPECULAR_MIS,
                       polygon_sampling_technique=T.SOLID_ANGLE,
                       mis_heuristic=MisHeuristic.POWER)
    # Diffuse-only allows every technique.
    RenderSettings(sampling_strategy=S.DIFFUSE_ONLY,
                   polygon_sampling_technique=T.SOLID_ANGLE)


def test_ggx_mis_denies_density_less_techniques():
    with pytest.raises(ValueError, match="sampling-independent density"):
        RenderSettings(sampling_strategy=S.DIFFUSE_GGX_MIS,
                       polygon_sampling_technique=T.AREA_TURK,
                       mis_heuristic=MisHeuristic.BALANCE)
    RenderSettings(sampling_strategy=S.DIFFUSE_GGX_MIS,
                   polygon_sampling_technique=T.SOLID_ANGLE,
                   mis_heuristic=MisHeuristic.BALANCE)


def test_our_heuristics_require_psa_specular_mis():
    with pytest.raises(ValueError, match="MIS heuristic"):
        RenderSettings(sampling_strategy=S.DIFFUSE_GGX_MIS,
                       polygon_sampling_technique=T.PROJECTED_SOLID_ANGLE,
                       mis_heuristic=MisHeuristic.OPTIMAL)
    RenderSettings(sampling_strategy=S.DIFFUSE_SPECULAR_MIS,
                   polygon_sampling_technique=T.PROJECTED_SOLID_ANGLE,
                   mis_heuristic=MisHeuristic.OPTIMAL)


def test_error_display_gating():
    with pytest.raises(ValueError, match="error display"):
        RenderSettings(sampling_strategy=S.DIFFUSE_ONLY,
                       polygon_sampling_technique=T.SOLID_ANGLE,
                       error_display=ErrorDisplay.DIFFUSE_BACKWARD)
    with pytest.raises(ValueError, match="specular error display"):
        RenderSettings(sampling_strategy=S.DIFFUSE_ONLY,
                       polygon_sampling_technique=T.PROJECTED_SOLID_ANGLE,
                       error_display=ErrorDisplay.SPECULAR_BACKWARD)
    with pytest.raises(ValueError, match="diffuse backward"):
        RenderSettings(sampling_strategy=S.DIFFUSE_ONLY,
                       polygon_sampling_technique=T.PROJECTED_SOLID_ANGLE_ARVO,
                       error_display=ErrorDisplay.DIFFUSE_FORWARD)
    RenderSettings(sampling_strategy=S.DIFFUSE_ONLY,
                   polygon_sampling_technique=T.PROJECTED_SOLID_ANGLE,
                   error_display=ErrorDisplay.DIFFUSE_FORWARD)


def test_legalize_matches_gui_coercion():
    """legalize_settings applies the same downgrades the GUI performs."""
    # Specular MIS + non-PSA technique -> technique forced to PSA.
    fixed = legalize_settings(sampling_strategy=S.DIFFUSE_SPECULAR_MIS,
                              polygon_sampling_technique=T.SOLID_ANGLE,
                              mis_heuristic=MisHeuristic.POWER)
    assert fixed.polygon_sampling_technique == T.PROJECTED_SOLID_ANGLE
    # GGX MIS + our heuristic -> heuristic downgraded to power
    # (user_interface.cpp:100-104).
    fixed = legalize_settings(sampling_strategy=S.DIFFUSE_GGX_MIS,
                              polygon_sampling_technique=T.SOLID_ANGLE,
                              mis_heuristic=MisHeuristic.OPTIMAL_CLAMPED)
    assert fixed.mis_heuristic == MisHeuristic.POWER
    assert not settings_violations(fixed)
    # replace() on a frozen legal object re-validates.
    import dataclasses
    legal = RenderSettings(sampling_strategy=S.DIFFUSE_ONLY,
                           polygon_sampling_technique=T.AREA_TURK)
    with pytest.raises(ValueError):
        dataclasses.replace(legal, sampling_strategy=S.DIFFUSE_GGX_MIS,
                            mis_heuristic=MisHeuristic.BALANCE)


def test_shadow_sc_budget_auto_sizing():
    """shadow_sc_budget=None auto-sizes from the scene's supercluster
    count (~10% coverage, floor 16) so arbitrary scenes run exact with
    no hand flags; an explicit value stays an override (VERDICT r4 #7)."""
    from vulkan_renderer_tpu.render.shading import SceneStatic
    auto = SceneStatic(light_count=1, light_texturing=(0,))
    # 300k-tri city class: 4.7k clusters -> 147 superclusters -> floor 16.
    assert auto.resolved_shadow_sc(4700) == 16
    # 1M-tri city class: 15.6k clusters -> 489 superclusters -> 48.
    assert auto.resolved_shadow_sc(15640) == 48
    # Small scenes floor at 16 (two-level cull is off below 1024 clusters
    # anyway, but the resolved value must stay valid).
    assert auto.resolved_shadow_sc(10) == 16
    forced = SceneStatic(light_count=1, light_texturing=(0,),
                         shadow_sc_budget=5)
    assert forced.resolved_shadow_sc(15640) == 5
