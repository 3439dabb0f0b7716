"""Two-frame HDR capture: produce a committed .hdr through the bit path.

The reference captures HDR screenshots without an fp32 swapchain by
rendering the SAME frame twice with HDR_COPY_LOW_BYTES / HDR_COPY_HIGH_BYTES
(main.c:1700-1763): each pass packs one byte of the half-float radiance
into the LDR target, and the host recombines the pair into fp16. Our
framebuffer is already fp32, so the bit path is a parity feature — this
tool exercises it end-to-end (render frame_bits=1, frame_bits=2,
recombine via combine_ldr_screenshots_into_hdr) and writes the result as
a Radiance .hdr, cross-checked against a direct linear render (the only
allowed difference is fp16 quantization).

Usage: python -m vulkan_renderer_tpu.tools.hdr_capture [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def capture(scene: str = "cornell_box", width: int = 256, height: int = 256,
            out_dir: str = os.path.join("results", "figures")) -> str:
    from ..core.settings import (PolygonSamplingTechnique, RenderSettings,
                                 SamplingStrategy)
    from ..experiments.harness import Experiment
    from ..experiments.setups import build_default_application
    from ..render.screenshot import (combine_ldr_screenshots_into_hdr,
                                     write_hdr)

    # animate_noise=False: both bit frames must sample the identical
    # radiance (the reference freezes the frame for the two captures).
    settings = RenderSettings(
        sampling_strategy=SamplingStrategy.DIFFUSE_ONLY,
        polygon_sampling_technique=(
            PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE),
        sample_count=1, trace_shadow_rays=False, animate_noise=False,
        output_linear_rgb=True)
    exp = Experiment(width, height, scene, settings,
                     screenshot_path="unused_%.3f.png")
    app = build_default_application(exp, data_directory="data")

    frames = {}
    for bits in (1, 2, 0):
        app.settings = dataclasses.replace(app.settings, frame_bits=bits)
        frames[bits] = np.asarray(app.render_frame_sync(), np.float32)
    combined = combine_ldr_screenshots_into_hdr(frames[1], frames[2])
    direct = frames[0]
    # fp16 quantization bound: half the ulp at the value's scale, plus the
    # /255 round-trip which is exact for uint8 payloads.
    err = np.abs(combined.astype(np.float64) - direct.astype(np.float64))
    rel = err / np.maximum(np.abs(direct), 2.0 ** -14)
    max_rel = float(rel.max())
    ok = max_rel <= 2.0 ** -10  # fp16 has 10 mantissa bits
    import jax
    tags = "_standin" if getattr(app, "scene_stand_in", False) else ""
    if jax.default_backend() == "cpu":
        tags += "_cpu"
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{scene}_hdr_2frame_capture{tags}.hdr")
    write_hdr(path, combined)
    print(f"wrote {path}: max relative error vs direct render "
          f"{max_rel:.3e} ({'within' if ok else 'EXCEEDS'} fp16 "
          f"quantization 2^-10)")
    if not ok:
        raise SystemExit(2)
    return path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--scene", default="cornell_box")
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--height", type=int, default=256)
    args = parser.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    capture(args.scene, args.width, args.height)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
