"""Benchmark driver: renders the flagship config and prints ONE JSON line.

Metric (BASELINE.json): ms/frame for shading at 1 spp. The target scene is
Bistro-class at 1080p; until the BVH path lands, the benchmark renders the
procedural cornell box at a reduced resolution and reports ms/frame with
the reference measurement protocol (median of repeated frames after
warmup; frame_timer.c:47-72 semantics).

Baseline for vs_baseline: the 20 ms/frame north-star target from
BASELINE.json (values < 1.0 mean faster than target).
"""

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=360)
    parser.add_argument("--frames", type=int, default=20)
    parser.add_argument("--spp", type=int, default=1)
    parser.add_argument("--shadows", action="store_true", default=True)
    args = parser.parse_args()

    import jax

    from __graft_entry__ import _make_test_setup
    from vulkan_renderer_tpu.core.settings import (PolygonSamplingTechnique,
                                                   RenderSettings,
                                                   SamplingStrategy)
    from vulkan_renderer_tpu.render.pipeline import (make_frame_constants,
                                                     render_frame_jit)

    scene, static, camera, _ = _make_test_setup()
    settings = RenderSettings(
        sampling_strategy=SamplingStrategy.DIFFUSE_SPECULAR_MIS,
        polygon_sampling_technique=PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE,
        sample_count=args.spp,
        trace_shadow_rays=args.shadows)
    constants = make_frame_constants(
        camera, args.width, args.height, settings,
        (np.arange(4) * 0x123456).astype(np.uint32))

    # Warmup (compile) + timed frames; median like frame_timer.c.
    img = render_frame_jit(scene, static, settings, constants,
                           args.width, args.height)
    img.block_until_ready()
    times = []
    for _ in range(args.frames):
        t0 = time.perf_counter()
        img = render_frame_jit(scene, static, settings, constants,
                               args.width, args.height)
        img.block_until_ready()
        times.append((time.perf_counter() - t0) * 1000.0)
    ms = float(np.median(times))
    baseline_ms = 20.0  # BASELINE.json north star (1080p Bistro target)
    print(json.dumps({
        "metric": f"ms/frame {args.width}x{args.height} {args.spp}spp "
                  f"shadows={bool(args.shadows)} cornell_box",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(ms / baseline_ms, 4),
    }))


if __name__ == "__main__":
    main()
