"""The experiment list + runner: paper figures and the timing benchmark.

Reference: experiment_list.c (the ~hundreds of experiment_t records) and
the runtime state machine in main.c:1948-2016. Each experiment is
(resolution, scene, quicksave, hdr flag, screenshot-path format string
consuming the measured frame time, full render settings); the runner warms
up (>= min_seconds AND >= min_frames, default 1 s / 110 frames), measures
the median frame time and writes the screenshot with the timing embedded
in the file name — simultaneously the figure generator and the perf
harness.
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

from ..core.settings import (ErrorDisplay, MisHeuristic,
                             PolygonSamplingTechnique as Tech, RenderSettings,
                             SamplingStrategy as Strat)
from ..core.timer import FrameTimer, WarmupProtocol
from .registry import resolve_scene

ALL_TECHNIQUES = list(Tech)


@dataclasses.dataclass(frozen=True)
class Experiment:
    """experiment_t (main.h:184-201)."""
    width: int
    height: int
    scene: str
    settings: RenderSettings
    screenshot_path: str  # format string taking the frame time in ms
    quicksave_path: str | None = None
    hdr: bool = False


def _figure_settings(**kwargs) -> RenderSettings:
    defaults = dict(show_polygonal_lights=True, animate_noise=False)
    defaults.update(kwargs)
    return RenderSettings(**defaults)


def create_experiment_list(width: int = 1920, height: int = 1080,
                           output_dir: str = "data/experiments"
                           ) -> list[Experiment]:
    """The experiment groups of experiment_list.c:22-545 (figures first,
    then the timing sweep of :364-409)."""
    experiments: list[Experiment] = []

    def add(scene, settings, tag, w=width, h=height, hdr=False):
        experiments.append(Experiment(
            w, h, scene, settings,
            os.path.join(output_dir, f"{scene}_{tag}_%.3f.png"),
            hdr=hdr))

    # Attic technique figures (experiment_list.c:57-101): 1 spp per
    # technique + a 128 spp reference.
    for tech in [Tech.AREA_TURK, Tech.SOLID_ANGLE, Tech.CLIPPED_SOLID_ANGLE,
                 Tech.BIQUADRATIC_COSINE_WARP_CLIPPING_HART,
                 Tech.PROJECTED_SOLID_ANGLE]:
        add("attic", _figure_settings(
            sampling_strategy=Strat.DIFFUSE_ONLY,
            polygon_sampling_technique=tech, sample_count=1),
            f"technique_{tech.value}_1spp")
    add("attic", _figure_settings(
        sampling_strategy=Strat.DIFFUSE_ONLY,
        polygon_sampling_technique=Tech.PROJECTED_SOLID_ANGLE,
        sample_count=128), "reference_128spp")

    # Attic error figures (:103-128).
    for display in [ErrorDisplay.DIFFUSE_BACKWARD,
                    ErrorDisplay.DIFFUSE_BACKWARD_SCALED,
                    ErrorDisplay.DIFFUSE_FORWARD]:
        add("attic", _figure_settings(
            sampling_strategy=Strat.DIFFUSE_ONLY,
            polygon_sampling_technique=Tech.PROJECTED_SOLID_ANGLE,
            error_display=display, sample_count=1),
            f"error_{display.value}")

    # MIS-plane heuristic sweep (:172-220).
    for heuristic in list(MisHeuristic):
        add("mis_plane", _figure_settings(
            sampling_strategy=Strat.DIFFUSE_SPECULAR_MIS,
            polygon_sampling_technique=Tech.PROJECTED_SOLID_ANGLE,
            mis_heuristic=heuristic, sample_count=1),
            f"mis_{heuristic.value}_1spp")

    # Cornell-box technique sweep (:222-264).
    for tech in [Tech.AREA_TURK, Tech.RECTANGLE_SOLID_ANGLE_URENA,
                 Tech.SOLID_ANGLE, Tech.CLIPPED_SOLID_ANGLE,
                 Tech.PROJECTED_SOLID_ANGLE]:
        add("cornell_box", _figure_settings(
            sampling_strategy=Strat.DIFFUSE_ONLY,
            polygon_sampling_technique=tech, sample_count=1),
            f"technique_{tech.value}_1spp", w=512, h=512)
    add("cornell_box", _figure_settings(
        sampling_strategy=Strat.DIFFUSE_ONLY,
        polygon_sampling_technique=Tech.PROJECTED_SOLID_ANGLE,
        sample_count=64), "reference_64spp", w=512, h=512)

    # Shadowed-plane bias demo (:266-292): biased vs unbiased at high spp.
    for tech in [Tech.PROJECTED_SOLID_ANGLE,
                 Tech.PROJECTED_SOLID_ANGLE_BIASED]:
        add("shadowed_plane", _figure_settings(
            sampling_strategy=Strat.DIFFUSE_ONLY,
            polygon_sampling_technique=tech, sample_count=2048,
            trace_shadow_rays=True), f"bias_{tech.value}_2048spp",
            w=256, h=256)

    # Timing sweep (:364-409): roughness planes, diffuse-only, no shadows;
    # vertex counts 3..7 x {central, decentral} x {128 lights 1 spp,
    # 1 light 128 spp} x all techniques. Central/decentral and light-count
    # variants are encoded in the quicksave in the reference; here the
    # runner's scene builder provides both light layouts.
    for vertex_count in range(3, 8):
        for case in ("central", "decentral"):
            for lights_tag, spp in (("128lights", 1), ("1light", 128)):
                for tech in ALL_TECHNIQUES:
                    add("roughness_planes", _figure_settings(
                        sampling_strategy=Strat.DIFFUSE_ONLY,
                        polygon_sampling_technique=tech, sample_count=spp,
                        show_polygonal_lights=False),
                        f"timing_v{vertex_count}_{case}_{lights_tag}_"
                        f"{tech.value}")

    return experiments


@dataclasses.dataclass
class ExperimentResult:
    experiment: Experiment
    frame_time_ms: float
    screenshot_path: str


def run_experiments(experiments, build_application, *,
                    min_warmup_seconds: float = 1.0,
                    min_warmup_frames: int = 110,
                    measure_frames: int = 100) -> list[ExperimentResult]:
    """Run experiments with the reference's measurement protocol.

    build_application: callable (Experiment) -> Application-like object
    with .render_frame_sync() and .settings; lets tests inject small
    resolutions / fewer warmup frames.
    """
    results = []
    for experiment in experiments:
        app = build_application(experiment)
        warmup = WarmupProtocol(min_warmup_seconds, min_warmup_frames)
        while not warmup.ready:
            app.render_frame_sync()
            warmup.frame()
        app.timer.reset()
        image = None
        for _ in range(max(measure_frames, 2)):
            image = app.render_frame_sync()
        frame_ms = app.timer.median_frame_time() * 1000.0
        path = experiment.screenshot_path % frame_ms
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        from ..render.screenshot import take_screenshot
        if experiment.hdr:
            path = path.replace(".png", ".hdr")
        take_screenshot(path, image)
        results.append(ExperimentResult(experiment, frame_ms, path))
    return results
