"""RMSE self-reference table for the BASELINE rebuild-target configs.

BASELINE.md's quality north star is "RMSE < 1e-3 vs reference" at the
target configs. True cross-implementation parity needs the reference's
data downloads (absent in this environment), so this tool runs the
IN-RENDERER self-reference protocol the reference itself uses for figure
ground truth (experiment_list.c:96-100: 64-128 spp in-renderer
references): a `spp`-sample estimate is compared against an independent
8x-deeper reference estimate of the same frame, both accumulated from
one-spp frames (the noise table advances per frame, animate_noise), and
the RMSE is reported in sRGB [0, 1] units. A config failing 1e-3 gets a
named cause in results/RESULTS.md.

One config per process (the axon TPU platform wedges on multiple large
compiled programs — CLAUDE.md): run with --config {1,2,3}. Appends one
CSV row to results/rmse.csv.

Usage: python -m vulkan_renderer_tpu.tools.rmse_table --config 1
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..core.settings import (MisHeuristic, PolygonSamplingTechnique,
                             RenderSettings, SamplingStrategy)
from ..ops.srgb import linear_to_srgb


def _configs():
    # BASELINE.md rebuild targets 1-3 (quality rows; row 4 is the perf
    # target covered by bench.py, row 5 by the linear-light figures).
    return {
        1: dict(scene="mis_plane", width=256, height=256,
                tag="quad light over textured plane; diffuse LTC; "
                    "no shadows",
                settings=RenderSettings(
                    sampling_strategy=SamplingStrategy.DIFFUSE_ONLY,
                    polygon_sampling_technique=(
                        PolygonSamplingTechnique.BASELINE),  # LTC baseline
                    sample_count=1, trace_shadow_rays=False,
                    animate_noise=True, output_linear_rgb=True)),
        2: dict(scene="cornell_box", width=512, height=512,
                tag="cornell box; PSA + GGX specular; light sampling only",
                settings=RenderSettings(
                    sampling_strategy=(
                        SamplingStrategy.DIFFUSE_SPECULAR_SEPARATELY),
                    polygon_sampling_technique=(
                        PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE),
                    sample_count=1, trace_shadow_rays=False,
                    animate_noise=True, output_linear_rgb=True)),
        3: dict(scene="roughness_planes", width=1920, height=1080,
                tag="roughness planes; full MIS + LTC + shadow rays",
                settings=RenderSettings(
                    sampling_strategy=SamplingStrategy.DIFFUSE_SPECULAR_MIS,
                    mis_heuristic=MisHeuristic.OPTIMAL_CLAMPED,
                    mis_visibility_estimate=0.5,
                    polygon_sampling_technique=(
                        PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE),
                    sample_count=1, trace_shadow_rays=True,
                    animate_noise=True, output_linear_rgb=True)),
    }


def run_config(n: int, spp: int, ref_spp: int | None = None,
               data_directory: str = "data",
               csv_path: str = os.path.join("results", "rmse.csv")):
    from ..experiments.harness import Experiment
    from ..experiments.setups import build_default_application

    cfg = _configs()[n]
    exp = Experiment(cfg["width"], cfg["height"], cfg["scene"],
                     cfg["settings"], screenshot_path="unused_%.3f.png")
    app = build_default_application(exp, data_directory=data_directory)
    # Test estimate at `spp`, reference estimate at `ref_spp` (default 8x,
    # like the paper's RMSE figures where the reference is much deeper
    # than the measured image — experiment_list.c:96-100 uses 64-128 spp
    # references for 1 spp figures). Both are frame accumulations with
    # the noise table advancing per frame (independent samples).
    ref_spp = ref_spp or 8 * spp
    counts = (spp, ref_spp)
    sums = [np.zeros((cfg["height"], cfg["width"], 3), np.float64)
            for _ in range(2)]
    for half in range(2):
        for _ in range(counts[half]):
            sums[half] += np.asarray(app.render_frame_sync(),
                                     np.float64)
    stats = app.frame_stats
    a = linear_to_srgb(np.clip(sums[0] / counts[0], 0.0, 1.0))
    b = linear_to_srgb(np.clip(sums[1] / counts[1], 0.0, 1.0))
    rmse = float(np.sqrt(np.mean((np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64)) ** 2)))
    stand_in = bool(getattr(app, "scene_stand_in", False)
                    or getattr(app, "layout_stand_in", False))
    import jax
    row = dict(config=n, tag=cfg["tag"], width=cfg["width"],
               height=cfg["height"], spp=spp, ref_spp=ref_spp,
               rmse=f"{rmse:.3e}",
               backend=jax.default_backend(), stand_in=int(stand_in),
               primary_uncertain=int(stats.get("primary_uncertain", 0)),
               shadow_overflow=int(stats.get("shadow_overflow", 0)))
    os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
    header = ",".join(row) + "\n"
    line = ",".join(str(v) for v in row.values()) + "\n"
    if not os.path.exists(csv_path):
        with open(csv_path, "w") as f:
            f.write(header)
    with open(csv_path, "a") as f:
        f.write(line)
    print(f"config {n} ({cfg['tag']}): RMSE {rmse:.3e} ({spp}spp vs "
          f"{ref_spp}spp ref) at {cfg['width']}x{cfg['height']} "
          f"(uncertain={row['primary_uncertain']}, "
          f"overflow={row['shadow_overflow']}, stand_in={stand_in})")
    return rmse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=int, required=True,
                        choices=(1, 2, 3))
    parser.add_argument("--spp", type=int, default=128)
    parser.add_argument("--ref-spp", type=int, default=None,
                        help="reference estimate sample count (default "
                             "8x --spp)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    run_config(args.config, args.spp, args.ref_spp)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
